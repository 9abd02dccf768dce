package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.AggView

/** The incremental materialized aggregate view ([[graft.sources.AggView]],
  * seventh stored family): delta algebra vs a one-shot GROUP BY, forget
  * as exact erasure, fold invariance + maintain(), crash-atomic mutations,
  * as-of serving. The oracle bridge is q:`q_aggview`.
  */
class AggViewSpec extends SparkSpec {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft-aggview").toString

  private def rows(ids: Range): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    ids.map(i => (i.toLong, s"k${i % 3}", (i % 7).toDouble + 0.25))
      .toDF("id", "k", "v")
  }

  private def collectView(dir: String, asOf: Option[Int] = None)
      : Map[String, (Long, BigDecimal)] =
    AggView.read(spark, dir, asOf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), BigDecimal(r.getDecimal(2))))).toMap

  private def direct(df: DataFrame): Map[String, (Long, BigDecimal)] =
    df.groupBy("k").agg(count(lit(1)).as("cnt"),
        sum(graft.Tables.dec(col("v"))).as("s"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), BigDecimal(r.getDecimal(2))))).toMap

  test("init + appends serve exactly the one-shot GROUP BY; forget is " +
      "exact erasure and a fully-erased key disappears") {
    val dir = tmp()
    AggView.write(rows(0 until 40), dir, Seq("k"), Seq("v"))
    assert(AggView.append(rows(40 until 90), dir) > 0)
    assert(AggView.append(rows(90 until 100), dir) > 0)
    assert(collectView(dir) == direct(rows(0 until 100)),
      "the maintained view must equal the recompute")
    // forget a slice: the view equals the GROUP BY over survivors
    assert(AggView.forget(rows(20 until 50), dir) > 0)
    val survivors = rows(0 until 20).unionByName(rows(50 until 100))
    assert(collectView(dir) == direct(survivors))
    // erase ALL of key k2 (ids ≡ 2 mod 3): it must disappear, not zero
    val k2ids = (0 until 100).filter(i => i % 3 == 2)
      .filterNot(i => 20 until 50 contains i)
    val spark2 = spark
    import spark2.implicits._
    AggView.forget(k2ids.map(i =>
        (i.toLong, s"k${i % 3}", (i % 7).toDouble + 0.25))
      .toDF("id", "k", "v"), dir)
    val v = collectView(dir)
    assert(!v.contains("k2"), s"fully-erased key must vanish (got $v)")
    assert(v.keySet == Set("k0", "k1"))
  }

  test("compact folds the LSM without changing the view, maintain() " +
      "drives it idempotently, empty mutations are version-less no-ops") {
    val dir = tmp()
    AggView.write(rows(0 until 10), dir, Seq("k"), Seq("v"))
    for (b <- 1 to 9)
      assert(AggView.append(rows(b * 10 until b * 10 + 10), dir) > 0)
    val before = collectView(dir)
    val versions = graft.sources.IndexCommit.versionsOf(dir).size
    // an empty append/forget publishes nothing
    assert(AggView.append(rows(0 until 0), dir) == 0)
    assert(AggView.forget(rows(0 until 0), dir) == 0)
    assert(graft.sources.IndexCommit.versionsOf(dir).size == versions,
      "empty mutations must not publish a version")
    val m1 = AggView.maintain(spark, dir)
    assert(m1.family == "aggview" && m1.action == "compact" && m1.units > 8)
    assert(collectView(dir) == before, "the fold must not move the view")
    assert(AggView.maintain(spark, dir).action == "noop")
    // annihilated keys leave physically at the fold
    AggView.forget(rows(0 until 100).filter(col("k") === "k1"), dir)
    assert(!collectView(dir).contains("k1"))
    // fragment again with k0-only rows (id 99 -> k0): k1 must stay dead
    for (_ <- 1 to 9) AggView.append(rows(99 until 100), dir)
    assert(AggView.maintain(spark, dir).action == "compact")
    val physical = spark.read.parquet(s"$dir/state")
    assert(physical.filter(col("k") === "k1").count() == 0,
      "the fold must drop keys whose every measure annihilated")
  }

  test("a mutation crashed at any failpoint publishes nothing and the " +
      "re-run lands exactly once; as-of serves each committed version") {
    val dir = tmp()
    AggView.write(rows(0 until 10), dir, Seq("k"), Seq("v"))
    val v0 = collectView(dir)
    for (point <- Seq("aggview-staged", "aggview-before-commit")) {
      graft.sources.IndexCommit.failpoint =
        p => if (p == point) throw new RuntimeException(s"boom:$p")
      val thrown = try { AggView.append(rows(10 until 20), dir); false }
        catch { case e: RuntimeException
          if e.getMessage == s"boom:$point" => true }
        finally graft.sources.IndexCommit.failpoint = _ => ()
      assert(thrown, s"failpoint $point must fire")
      assert(graft.sources.IndexCommit.versionsOf(dir) == Seq(0),
        s"a mutation crashed at $point must publish nothing")
      assert(collectView(dir) == v0)
    }
    assert(AggView.append(rows(10 until 20), dir) > 0)
    assert(collectView(dir) == direct(rows(0 until 20)),
      "the re-run must land exactly once, not double-count")
    // as-of: version 0 still serves the pre-append view
    assert(collectView(dir, asOf = Some(0)) == v0)
  }

  test("point lookup prunes to the key's kb partition and equals the " +
      "full view's row") {
    val dir = tmp()
    AggView.write(rows(0 until 60), dir, Seq("k"), Seq("v"), nBuckets = 8)
    AggView.append(rows(60 until 100), dir)
    val looked = AggView.lookup(spark, dir, Seq("k1"))
    val plan = looked.queryExecution.executedPlan.toString
    val stateScan = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("/state"))
      .mkString("\n")
    assert(stateScan.contains("PartitionFilters: [") &&
      ".*PartitionFilters: \\[[^\\]]*kb.*".r.findFirstIn(stateScan).isDefined,
      s"lookup scan must carry a kb partition filter:\n$stateScan")
    val got = looked.collect().map(r => r.getString(0) ->
      ((r.getLong(1), BigDecimal(r.getDecimal(2))))).toMap
    assert(got == collectView(dir).filter(_._1 == "k1"),
      "the pruned lookup must equal the full fold's row")
  }

  test("route enriches every arrival from the pruned kb buckets; " +
      "unknown keys answer zeros") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmp()
    AggView.write(rows(0 until 100), dir, Seq("k"), Seq("v"), nBuckets = 8)
    val arrivals = Seq((1L, "k0"), (2L, "k2"), (3L, "nope"))
      .toDF("aid", "k")
    val routed = AggView.route(arrivals, dir)
    val plan = routed.queryExecution.executedPlan.toString
    val stateScan = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("/state"))
      .mkString("\n")
    assert(stateScan.contains("PartitionFilters: [") &&
      ".*PartitionFilters: \\[[^\\]]*kb.*".r.findFirstIn(stateScan).isDefined,
      s"route scan must carry kb partition filters:\n$stateScan")
    val got = routed.collect().map(r => r.getLong(0) ->
      ((r.getLong(2), BigDecimal(r.getDecimal(3))))).toMap
    val view = collectView(dir)
    assert(got(1L) == view("k0") && got(2L) == view("k2"),
      "known keys must carry their served totals")
    assert(got(3L) == ((0L, BigDecimal("0.00"))),
      "unknown keys must answer zeros, not nulls")
  }

  /** The minmax lifecycle's fact table and its direct GROUP BY — ids
    * carry distinct v values so every forget of a key's extremum has a
    * well-defined runner-up.
    */
  private def mmRows(ids: Range): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    ids.map(i => (i.toLong, s"k${i % 3}", i.toDouble + 0.5))
      .toDF("id", "k", "v")
  }

  private def mmDirect(df: DataFrame)
      : Map[String, (Long, Double, Double, Double)] =
    df.groupBy("k").agg(count(lit(1)).as("cnt"),
        (sum(graft.Tables.dec(col("v"))).cast("double") / count(lit(1)))
          .as("a"), min("v").as("mn"), max("v").as("mx"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap

  private def mmView(dir: String)
      : Map[String, (Long, Double, Double, Double)] =
    AggView.read(spark, dir).collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap

  test("min/max measures: appends merge extrema, forget re-derives the " +
      "survivor extrema from the base, avg is served — all equal the " +
      "recompute (VERDICT r15 #2)") {
    val dir = tmp()
    AggView.write(mmRows(0 until 30), dir, Seq("k"), Seq("v"),
      minmax = Seq("v"))
    // appends extend the extrema upward: LWW rows must track the merge
    assert(AggView.append(mmRows(30 until 90), dir) > 0)
    assert(AggView.append(mmRows(90 until 100), dir) > 0)
    assert(mmView(dir) == mmDirect(mmRows(0 until 100)))
    // forget the TOP slice — every key's max was in it (ids 90..99):
    // the served max must re-derive the survivors' max, which negation
    // cannot do
    val survivors = mmRows(0 until 90)
    assert(AggView.forget(mmRows(90 until 100), dir,
      base = Some(survivors)) > 0)
    assert(mmView(dir) == mmDirect(survivors),
      "forget of each key's maximum must serve the runner-up")
    // forget a MIDDLE slice: extrema unchanged, cnt/sum/avg move
    val survivors2 = mmRows(0 until 30).unionByName(mmRows(60 until 90))
    assert(AggView.forget(mmRows(30 until 60), dir,
      base = Some(survivors2)) > 0)
    assert(mmView(dir) == mmDirect(survivors2))
    // a later append after the forgets still merges correctly
    assert(AggView.append(mmRows(100 until 120), dir) > 0)
    assert(mmView(dir) ==
      mmDirect(survivors2.unionByName(mmRows(100 until 120))))
    // compaction folds without moving the served view (LWW survives)
    for (b <- 0 until 8) AggView.append(mmRows(200 + b until 201 + b), dir)
    assert(AggView.maintain(spark, dir).action == "compact")
    assert(mmView(dir) == mmDirect(survivors2
      .unionByName(mmRows(100 until 120))
      .unionByName(mmRows(200 until 208))),
      "the fold must preserve last-writer-wins extrema")
  }

  test("a min/max view's forget without the surviving base refuses " +
      "loudly; a fully-erased key disappears") {
    val dir = tmp()
    AggView.write(mmRows(0 until 30), dir, Seq("k"), Seq("v"),
      minmax = Seq("v"))
    val e = intercept[IllegalArgumentException] {
      AggView.forget(mmRows(0 until 3), dir)
    }
    assert(e.getMessage.contains("not invertible"),
      s"the refusal must explain the contract (got: ${e.getMessage})")
    // erase ALL of k2 (ids ≡ 2 mod 3): null extrema + zero cnt → gone
    val k2 = mmRows(0 until 30).filter(col("k") === "k2")
    val rest = mmRows(0 until 30).filter(col("k") =!= "k2")
    assert(AggView.forget(k2, dir, base = Some(rest)) > 0)
    assert(mmView(dir) == mmDirect(rest))
    assert(!mmView(dir).contains("k2"))
  }

  test("route refuses a batch whose columns collide with the served " +
      "aggregates (ADVICE r15: the join would be ambiguous)") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmp()
    AggView.write(rows(0 until 20), dir, Seq("k"), Seq("v"))
    val clashing = Seq((1L, "k0", 7L)).toDF("aid", "k", "cnt")
    val e = intercept[IllegalArgumentException] {
      AggView.route(clashing, dir)
    }
    assert(e.getMessage.contains("cnt"),
      s"the refusal must name the clashing column (got: ${e.getMessage})")
    val e2 = intercept[IllegalArgumentException] {
      AggView.route(Seq((1L, "k0", 1.0)).toDF("aid", "k", "sum_v"), dir)
    }
    assert(e2.getMessage.contains("sum_v"))
  }

  test("appends under a real stream: the maintained view tracks every " +
      "micro-batch") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import sqlCtx.implicits._
    val dir = tmp()
    AggView.write(rows(0 until 10), dir, Seq("k"), Seq("v"))
    val input = MemoryStream[(Long, String, Double)]
    val q = input.toDF().toDF("id", "k", "v").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        AggView.append(batch, dir); ()
      }.start()
    val h1 = (10 until 40).map(i =>
      (i.toLong, s"k${i % 3}", (i % 7).toDouble + 0.25))
    val h2 = (40 until 70).map(i =>
      (i.toLong, s"k${i % 3}", (i % 7).toDouble + 0.25))
    try {
      input.addData(h1); q.processAllAvailable()
      // mid-stream: the view already serves the first batch
      assert(collectView(dir) == direct(rows(0 until 40)))
      input.addData(h2); q.processAllAvailable()
    } finally q.stop()
    assert(collectView(dir) == direct(rows(0 until 70)),
      "the streamed view must equal the one-shot GROUP BY")
  }
}

package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopKPerGroup

/** The custom grouped-top-k physical operator: window-equivalence, plan
  * shape, and edge semantics.
  */
class TopKPerGroupSpec extends SparkSpec {
  private lazy val orders = Tables.t(spark, sf001, "orders")
    .select("o_orderpriority", "o_orderkey", "o_totalprice")

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  test("equals the row_number window plan for every k") {
    for (k <- Seq(1, 3, 7, 100000)) {
      val custom = TopKPerGroup(orders, Seq("o_orderpriority"),
        Seq("o_totalprice" -> false, "o_orderkey" -> true), k)
      val window = windowTopK(k)
      assert(custom.exceptAll(window).count() == 0, s"extra rows at k=$k")
      assert(window.exceptAll(custom).count() == 0, s"missing rows at k=$k")
    }
  }

  test("k beyond the group size keeps whole groups") {
    val all = TopKPerGroup(orders, Seq("o_orderpriority"),
      Seq("o_orderkey" -> true), k = 100000)
    assert(all.count() == orders.count())
  }

  test("plans as TopKPerGroupExec with no sort and no window") {
    val df = TopKPerGroup(orders, Seq("o_orderpriority"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroup"), s"expected custom operator in:\n$p")
    assert(!p.contains("Window"), s"no window expected:\n$p")
    assert(!p.contains("Sort "), s"no per-partition full sort expected:\n$p")
    // the clustering exchange the window plan would need is still demanded
    assert(p.contains("Exchange"), s"expected hash clustering exchange:\n$p")
  }

  test("deterministic under repartitioning (total order contract)") {
    val a = TopKPerGroup(orders.repartition(13), Seq("o_orderpriority"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 5).collect().toSet
    val b = TopKPerGroup(orders.repartition(3), Seq("o_orderpriority"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 5).collect().toSet
    assert(a == b)
  }

  test("unknown column name fails fast") {
    intercept[IllegalArgumentException] {
      TopKPerGroup(orders, Seq("nope"), Seq(("o_orderkey", true)), 1)
    }
  }

  test("sort-based mode equals heap mode and demands a child sort") {
    val heap = TopKPerGroup(orders, Seq("o_orderpriority"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 5).collect().toSet
    spark.conf.set(TopKPerGroup.sortBasedKey, "true")
    try {
      val sorted = TopKPerGroup(orders, Seq("o_orderpriority"),
        Seq("o_totalprice" -> false, "o_orderkey" -> true), 5)
      assert(sorted.collect().toSet == heap)
      val p = sorted.queryExecution.executedPlan.toString
      assert(p.contains("TopKPerGroup"), s"expected custom operator in:\n$p")
      assert(p.contains("Sort "),
        s"sort mode must demand the spill-safe child sort:\n$p")
    } finally spark.conf.unset(TopKPerGroup.sortBasedKey)
  }

  test("heap mode fails fast beyond the group-cardinality guard") {
    spark.conf.set(TopKPerGroup.maxHeapGroupsKey, "2")
    try {
      val e = intercept[Exception] {
        TopKPerGroup(orders, Seq("o_orderkey"),
          Seq("o_totalprice" -> false), 1).count()
      }
      val messages = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
        .mkString("\n")
      assert(messages.contains("sortBased"),
        s"expected the guard's guidance in:\n$messages")
    } finally spark.conf.unset(TopKPerGroup.maxHeapGroupsKey)
  }

  test("column resolution follows the session resolver (case-insensitive)") {
    val df = TopKPerGroup(orders, Seq("O_ORDERPRIORITY"),
      Seq("o_totalPrice" -> false, "o_orderkey" -> true), 2)
    assert(df.count() == 10) // 5 priorities x k=2
  }

  test("sortBased conf set AFTER building the frame takes effect at planning") {
    // the mode is resolved in the strategy (planning time), like any other
    // spark.* runtime conf — NOT baked into the node at construction
    val df = TopKPerGroup(orders, Seq("o_orderpriority"),
      Seq("o_orderkey" -> true), 3)
    spark.conf.set(TopKPerGroup.sortBasedKey, "true")
    try {
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("Sort "),
        s"conf set after construction must still select sort mode:\n$p")
      assert(df.count() == 15)
    } finally spark.conf.unset(TopKPerGroup.sortBasedKey)
  }

  test("ordering-equal but byte-distinct float keys stay ONE group (both modes)") {
    import spark.implicits._
    // -0.0 and 0.0 are SQL-equal yet bit-distinct: without normalization
    // the clustering exchange scatters them to different partitions and
    // byte-equality group detection splits the logical group (> k rows)
    val df = Seq((0.0, 1L), (-0.0, 2L), (0.0, 3L), (-0.0, 4L),
      (Double.NaN, 5L), (Double.NaN, 6L), (Double.NaN, 7L))
      .toDF("g", "id").repartition(5)
    for (mode <- Seq("false", "true")) {
      spark.conf.set(TopKPerGroup.sortBasedKey, mode)
      try {
        val out = TopKPerGroup(df, Seq("g"), Seq("id" -> true), 2)
          .select("id").as[Long].collect().toSet
        assert(out == Set(1L, 2L, 5L, 6L),
          s"sortBased=$mode: expected k=2 per LOGICAL group, got $out")
      } finally spark.conf.unset(TopKPerGroup.sortBasedKey)
    }
  }

  test("randomized window-equivalence (seeded corpora, ties included)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 200 + rnd.nextInt(800)
      val nGroups = 1 + rnd.nextInt(20)
      val k = 1 + rnd.nextInt(7)
      // small value domain on purpose: plenty of ties in the first sort
      // key, so the id tiebreak is load-bearing
      val data = (0 until n).map(i =>
        (rnd.nextInt(nGroups).toLong, i.toLong, rnd.nextInt(10).toDouble))
      val df = data.toDF("g", "id", "v").repartition(7)
      val custom = TopKPerGroup(df, Seq("g"),
        Seq("v" -> false, "id" -> true), k)
      val w = Window.partitionBy(col("g"))
        .orderBy(col("v").desc, col("id"))
      val window = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
      assert(custom.exceptAll(window).count() == 0,
        s"trial $trial (n=$n groups=$nGroups k=$k): extra rows")
      assert(window.exceptAll(custom).count() == 0,
        s"trial $trial (n=$n groups=$nGroups k=$k): missing rows")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.queries.{GraphQueries, JoinQueries}

/** Graph + star-join verification on sf0.001 — PageRank checked against a
  * from-scratch driver-side integer recompute (adjacency maps, no Spark),
  * the star join against plan shape (the DuckDB oracle already checks its
  * values at sf0.01).
  */
class GraphSpec extends SparkSpec {

  test("pagerank: exact match with a driver-side integer recompute") {
    val got = GraphQueries.qPagerank(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // independent recompute: build the undirected edge list straight from
    // the two parquet tables, then run the same 3 synchronous iterations
    // with BigInt arithmetic (no shared code with the query under test)
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select("l_orderkey", "l_suppkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val ord = spark.read.parquet(s"$sf001/orders.parquet")
      .select("o_orderkey", "o_custkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = li.flatMap { case (ok, sk) =>
      ord.get(ok).map(ck => (s"c$ck", s"s$sk")) }.distinct
    val edges = pairs ++ pairs.map { case (a, b) => (b, a) }
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    val scale = BigInt("1000000000000")
    val base = BigInt("150000000000")
    var score: Map[String, BigInt] = adj.map { case (n, _) => n -> scale }
    for (_ <- 1 to 3) {
      val contribs = adj.toSeq.flatMap { case (src, dsts) =>
        val c = (score(src) * 85) / (100 * dsts.length)
        dsts.map(_ -> c)
      }
      score = contribs.groupBy(_._1)
        .map { case (n, cs) => n -> (base + cs.map(_._2).sum) }
    }
    assert(got.size == score.size)
    score.foreach { case (n, s) =>
      assert(got(n) == s.toLong, s"$n: spark ${got(n)} vs recompute $s") }
    // floor division only loses mass: total stays under nodes * scale
    assert(score.values.sum < scale * score.size)
  }

  test("pagerank: iteration joins are co-partitioned, no score exchange") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{
      BroadcastExchangeLike, ShuffleExchangeLike}
    import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
    val df = GraphQueries.qPagerank(spark, sf001)
    df.count()
    // walk the FINAL adaptive plan programmatically, recursing through AQE
    // query-stage wrappers (their subtree is a field, not a child) but NOT
    // into InMemoryTableScan's innerChildren — so this flattening sees
    // exactly the executed loop, never the cached edge-build plan
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case q: QueryStageExec => flatten(q.plan)
      case _ => p.children.flatMap(flatten)
    })
    val loop = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => flatten(a.finalPhysicalPlan)
      case p => flatten(p)
    }
    // every iteration join is the hinted shuffled hash join reusing the
    // src-partitioned edge cache against node-partitioned scores — if AQE
    // ever demotes one to a per-round broadcast, the loop regrows a
    // score-side exchange (and a driver collect) per iteration
    assert(loop.count(_.isInstanceOf[ShuffledHashJoinExec]) == 3,
      "expected all 3 iteration joins to be shuffled hash joins")
    assert(!loop.exists(_.isInstanceOf[BroadcastExchangeLike]),
      "iteration joins must not broadcast the score side")
    // the only shuffles left: 3 scatter aggregations (contribution rows
    // genuinely change key from src to dst) + the final presentation sort.
    // The scatter exchange itself is PageRank's inherent SpMV
    // communication — no layout deletes it (see qPagerank Scaladoc)
    assert(loop.count(_.isInstanceOf[ShuffleExchangeLike]) == 4,
      "loop must carry exactly 3 scatter exchanges + 1 final sort exchange")
    // r11: the edge side is a BUCKETED catalog scan (4 reads: 3 iteration
    // joins + the initial-score distinct), reporting hash partitioning on
    // src straight from the layout — no cache deserialization, no
    // edge-side exchange anywhere
    import org.apache.spark.sql.execution.FileSourceScanExec
    val bucketedScans = loop.collect {
      case f: FileSourceScanExec if f.bucketedScan => f
    }
    assert(bucketedScans.size == 4,
      s"expected 4 bucketed edge scans, got ${bucketedScans.size}")
    assert(!loop.exists(_.getClass.getSimpleName.contains("InMemoryTableScan")),
      "edge relation must come from the bucketed table, not a cache")
  }

  test("star join: filters pushed, dimensions broadcast, values consistent") {
    val df = JoinQueries.qStarJoin(spark, sf001)
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the date range and region name reach their parquet scans
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"))
    assert(plan.contains("EqualTo(r_name,ASIA)"))
    // every dimension side is a broadcast join; the fact side never
    // builds a hash table from anything fact-sized
    assert(plan.linesIterator.count(_.contains("BroadcastHashJoin")) >= 3)
    // cross-check revenue mass against a single-purpose recompute that
    // joins in the opposite order and never groups
    val d = sf001
    val total = spark.read.parquet(s"$d/lineitem.parquet")
      .join(spark.read.parquet(s"$d/orders.parquet")
        .filter(col("o_orderdate").between("1996-01-01", "1996-12-31")),
        col("l_orderkey") === col("o_orderkey"))
      .join(spark.read.parquet(s"$d/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .join(spark.read.parquet(s"$d/supplier.parquet"),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(spark.read.parquet(s"$d/nation.parquet"),
        col("s_nationkey") === col("n_nationkey"))
      .join(spark.read.parquet(s"$d/region.parquet")
          .filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .count()
    assert(rows.map(_.getLong(1)).sum == total)
  }
}

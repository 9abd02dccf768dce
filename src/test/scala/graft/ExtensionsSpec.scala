package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.{ApproxDistinctRewrite, ApproxPercentileRewrite, GraftExtensions}

/** SparkSessionExtensions wiring: injected SQL functions and the opt-in
  * approx-distinct rewrite, on a session built with the extension (the
  * shared suite session stays untouched — built first, restored after).
  */
class ExtensionsSpec extends SparkSpec {

  /** A second session on the same SparkContext, built WITH the extension;
    * default/active session restored so other suites see the shared one.
    */
  private def withExtendedSession[T](f: SparkSession => T): T = {
    val shared = spark // force the shared session to exist first
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      f(ext)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("injected functions resolve in SQL on an extension-built session") {
    withExtendedSession { ext =>
      val r = ext.sql(
        """SELECT dot_product(array(1D, 2D), array(3D, 4D)) AS d,
          |       CAST(gunzip(gzip('round trip')) AS STRING) AS s,
          |       rolling_hash('abc') IS NOT NULL AS h,
          |       simhash64(array('a', 'b')) IS NOT NULL AS sh""".stripMargin)
        .head()
      assert(r.getDouble(0) == 11.0)
      assert(r.getString(1) == "round trip")
      assert(r.getBoolean(2) && r.getBoolean(3))
    }
  }

  test("approx-distinct rewrite is off by default, exact results unchanged") {
    withExtendedSession { ext =>
      Tables.t(ext, sf001, "orders").createOrReplaceTempView("x_orders")
      val exact = ext.sql(
        "SELECT count(DISTINCT o_custkey) AS n FROM x_orders").head().getLong(0)
      val plain = Tables.t(ext, sf001, "orders")
        .select(countDistinct(col("o_custkey"))).head().getLong(0)
      assert(exact == plain)
    }
  }

  test("planner strategy is injected: custom node plans without manual attach") {
    withExtendedSession { ext =>
      // build the logical node directly (no Bridge.ensureStrategy) — only
      // the injected strategy can plan it
      val df = Tables.t(ext, sf001, "orders")
        .select("o_orderpriority", "o_orderkey")
      val analyzed = df.queryExecution.analyzed
      val a = analyzed.output.find(_.name == "o_orderpriority").get
      val b = analyzed.output.find(_.name == "o_orderkey").get
      val node = graft.plans.TopKPerGroupNode(Seq(a),
        Seq(org.apache.spark.sql.catalyst.expressions.SortOrder(b,
          org.apache.spark.sql.catalyst.expressions.Ascending)), 2,
        sortBased = None, analyzed)
      val out = org.apache.spark.sql.graftbridge.Bridge.ofRows(ext, node)
      assert(out.count() == 10) // 5 priorities x k=2
      assert(out.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    }
  }

  test("ensureStrategy does not duplicate an extension-injected strategy") {
    withExtendedSession { ext =>
      // the apply() path calls Bridge.ensureStrategy; on a session that
      // already carries the strategy via injectPlannerStrategy it must not
      // append a second registration to experimental.extraStrategies
      val df = graft.plans.TopKPerGroup(
        Tables.t(ext, sf001, "orders")
          .select("o_orderpriority", "o_orderkey"),
        Seq("o_orderpriority"), Seq("o_orderkey" -> true), 1)
      assert(df.count() == 5)
      val exp = ext.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .experimental
      assert(exp.extraStrategies.isEmpty,
        s"duplicate registration: ${exp.extraStrategies}")
    }
  }

  test("zorder2 matches a bit-by-bit reference interleave, incl. SQL form") {
    val spark2 = spark
    import spark2.implicits._
    import graft.functions.gcolumns.zorder2
    def ref(x: Int, y: Int): Long =
      (0 until 16).foldLeft(0L) { (z, i) =>
        z | (((x >> i) & 1).toLong << (2 * i)) |
          (((y >> i) & 1).toLong << (2 * i + 1))
      }
    val pts = Seq((0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321),
      (65536 + 7, 3)) // 17-bit x: only the low 16 bits participate
    val got = pts.toDF("x", "y")
      .select(zorder2(col("x"), col("y"))).as[Long].collect()
    pts.zip(got).foreach { case ((x, y), z) =>
      assert(z == ref(x, y), s"($x,$y)")
    }
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT zorder2(12345, 54321)").head().getLong(0)
    assert(viaSql == ref(12345, 54321))
  }

  test("heavy_hitters registers as a SQL aggregate") {
    val spark2 = spark
    import spark2.implicits._
    graft.functions.GraftFunctions.register(spark)
    Seq("a", "b", "a", "c", "a", "b").toDF("w").createOrReplaceTempView("hh_in")
    val m = spark.sql("SELECT heavy_hitters(w) AS hh FROM hh_in")
      .select(explode(col("hh"))).as[(String, Long)].collect().toMap
    assert(m == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("z-order layout serves 2-D box pruning where row-major serves one dim") {
    // 64x64 grid, blocks of 64 consecutive rows ≙ parquet row groups.
    // Under z-order the blocks are aligned 8x8 tiles, so an 8x8 box query
    // intersects 1 block; row-major (sort by x then y) strips intersect 8.
    // This bbox-intersection count IS what min/max row-group pruning reads.
    val pts = for (x <- 0 until 64; y <- 0 until 64) yield (x, y)
    def blocksTouched(sorted: Seq[(Int, Int)]): Int =
      sorted.grouped(64).count { blk =>
        val (xs, ys) = (blk.map(_._1), blk.map(_._2))
        // bbox intersects the box query x,y ∈ [8,15]?
        xs.min <= 15 && xs.max >= 8 && ys.min <= 15 && ys.max >= 8
      }
    val byZ = pts.sortBy { case (x, y) =>
      graft.functions.ZOrderImpl.interleave16(x, y)
    }
    val byRowMajor = pts.sortBy { case (x, y) => (x, y) }
    assert(blocksTouched(byZ) == 1)
    assert(blocksTouched(byRowMajor) == 8)
  }

  test("flag on: count(DISTINCT x) plans and evaluates as the HLL sketch") {
    withExtendedSession { ext =>
      Tables.t(ext, sf001, "orders").createOrReplaceTempView("x_orders")
      ext.conf.set(ApproxDistinctRewrite.flagKey, "true")
      try {
        val df = ext.sql("SELECT count(DISTINCT o_custkey) AS n FROM x_orders")
        val optimized = df.queryExecution.optimizedPlan.toString
        assert(optimized.contains("approx_count_distinct"),
          s"expected sketch aggregate in:\n$optimized")
        // no distinct-induced Expand/double shuffle survives
        assert(!optimized.contains("Expand"), s"unexpected Expand:\n$optimized")
        val approx = df.head().getLong(0)
        val expected = Tables.t(ext, sf001, "orders")
          .select(approx_count_distinct(col("o_custkey"))).head().getLong(0)
        assert(approx == expected,
          "rewritten plan must equal the explicit sketch aggregate")
        // multi-arg distinct keeps exact semantics
        val multi = ext.sql(
          """SELECT count(DISTINCT o_custkey, o_orderstatus) AS n
            |FROM x_orders""".stripMargin)
        assert(!multi.queryExecution.optimizedPlan.toString
          .contains("approx_count_distinct"))
      } finally ext.conf.set(ApproxDistinctRewrite.flagKey, "false")
    }
  }

  test("flag on: exact percentile plans as the GK sketch, within rank bound") {
    withExtendedSession { ext =>
      ext.conf.set(ApproxPercentileRewrite.flagKey, "true")
      try {
        val li = Tables.t(ext, sf001, "lineitem")
        val df = li.groupBy(col("l_returnflag"))
          .agg(percentile(col("l_quantity"), lit(0.9)).as("p90"))
        val optimized = df.queryExecution.optimizedPlan.toString
        assert(optimized.contains("percentile_approx"),
          s"expected sketch aggregate in:\n$optimized")
        // no exact percentile survives ("percentile_approx(" would defeat a
        // bare "percentile(" substring check — strip it first)
        assert(!optimized.replace("percentile_approx", "")
            .contains("percentile("),
          s"exact percentile survived the rewrite:\n$optimized")
        // rewritten plan must equal the explicit sketch aggregate
        // (accuracy from the conf default, 10000)
        val explicit = li.groupBy(col("l_returnflag"))
          .agg(percentile_approx(col("l_quantity"), lit(0.9), lit(10000))
            .as("p90"))
        val got = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        val exp = explicit.collect()
          .map(r => r.getString(0) -> r.getDouble(1)).toMap
        assert(got == exp, s"rewritten $got != explicit sketch $exp")
        // GK contract per group: rank(approx) within p*n ± n/accuracy
        // (±1 slack for the floor/ceil boundary)
        got.foreach { case (flag, v) =>
          val vals = li.where(col("l_returnflag") === flag)
            .select(col("l_quantity")).collect().map(_.getDouble(0))
          val n = vals.length.toDouble
          // l_quantity is discrete, so the returned value occupies a whole
          // TIE RUN of ranks [count(<v)+1, count(<=v)]; the GK contract is
          // that this run intersects the target band 0.9·n ± n/accuracy
          val lo = vals.count(_ < v).toDouble + 1
          val hi = vals.count(_ <= v).toDouble
          val eps = n / 10000.0
          assert(lo <= math.ceil(0.9 * n + eps) + 1 &&
                 hi >= math.floor(0.9 * n - eps) - 1,
            s"group $flag: approx $v rank run [$lo,$hi] misses 0.9*$n ± $eps")
        }
        // non-DOUBLE input keeps exact semantics (type would change)
        val intCase = li.groupBy(col("l_returnflag"))
          .agg(percentile(col("l_linenumber"), lit(0.5)).as("m"))
        assert(!intCase.queryExecution.optimizedPlan.toString
          .contains("percentile_approx"))
      } finally ext.conf.set(ApproxPercentileRewrite.flagKey, "false")
    }
  }
}

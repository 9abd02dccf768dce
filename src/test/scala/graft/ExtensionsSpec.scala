package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.{ApproxDistinctRewrite, GraftExtensions}

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
}

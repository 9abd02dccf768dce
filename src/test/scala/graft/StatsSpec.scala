package graft

import org.apache.spark.sql.functions._

import graft.queries.GroupingQueries

/** The exact-moment statistical aggregates (q_corr) against Spark's own
  * one-pass corr/covar_samp/stddev_samp: the decimal-moment formulas must
  * agree with the streaming implementations to floating-point tolerance
  * (they are algebraically identical; only accumulation order differs).
  */
class StatsSpec extends SparkSpec {

  test("manual moment formulas match built-in corr/covar/stddev") {
    val manual = GroupingQueries.qCorr(spark, sf001)
    val builtin = Tables.t(spark, sf001, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        covar_samp(col("l_quantity"), col("l_extendedprice")).as("cv"),
        stddev_samp(col("l_quantity")).as("sq"),
        stddev_samp(col("l_extendedprice")).as("sp"))
    val m = manual.collect().map(r => r.getString(0) -> r).toMap
    builtin.collect().foreach { r =>
      val mm = m(r.getString(0))
      def near(a: Double, b: Double, tol: Double) =
        math.abs(a - b) <= tol * math.max(1.0, math.abs(b))
      assert(near(mm.getAs[Double]("corr_qty_price"), r.getAs[Double]("c"), 1e-9))
      assert(near(mm.getAs[Double]("covar_qty_price"), r.getAs[Double]("cv"), 1e-9))
      assert(near(mm.getAs[Double]("stddev_qty"), r.getAs[Double]("sq"), 1e-9))
      assert(near(mm.getAs[Double]("stddev_price"), r.getAs[Double]("sp"), 1e-9))
    }
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B: custom TopKPerGroupExec vs the row_number window plan at sf0.1. */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    // high-cardinality grouping: top-3 lineitems per order (~150k groups)
    val li = graft.Tables.t(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    def time(name: String)(f: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$name run$i ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
      }
    }
    time("custom heap") {
      graft.plans.TopKPerGroup(li, Seq("l_orderkey"),
        Seq("l_extendedprice" -> false, "l_linenumber" -> true), 3).count()
    }
    time("window sort") {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
      li.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).drop("rn").count()
    }
    spark.stop()
  }
}

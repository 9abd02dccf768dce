package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of one SparkEntry query:
  * PlanDump <name> [sfDir]. Runs the query once first so AQE's final
  * plan (the one that actually executed) is what gets printed.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val df = graft.SparkEntry.queries(args(0))(spark, dir)
    df.count()
    df.explain("formatted")
    spark.stop()
  }
}

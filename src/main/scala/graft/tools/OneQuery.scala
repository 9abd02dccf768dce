package graft.tools

import org.apache.spark.sql.SparkSession

/** Time one SparkEntry query in a fresh JVM: OneQuery <name> [sfDir]. */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(args(0))(spark, dir).count()
      println(f"run$i ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }
    spark.stop()
  }
}

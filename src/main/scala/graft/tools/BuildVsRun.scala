package graft.tools

import org.apache.spark.sql.SparkSession

/** Split one SparkEntry query's per-call cost into DataFrame CONSTRUCTION
  * (plan building, cache-key hashing, any plan-time driver collects) vs
  * the count() action — three repeats after a cold first call:
  * BuildVsRun <name> [sfDir].
  */
object BuildVsRun {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val fn = graft.SparkEntry.queries(args(0))
    fn(spark, dir).count() // cold pass: caches build
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val t1 = System.nanoTime()
      val n = df.count()
      val t2 = System.nanoTime()
      println(f"run$i build=${(t1 - t0) / 1e9}%6.2fs count=${(t2 - t1) / 1e9}%6.2fs rows=$n")
    }
    spark.stop()
  }
}

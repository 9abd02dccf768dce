package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Storage-level A/B for the shared corpus caches on this microVM (slow
  * first-touch page faults): materialize + re-read cost per level.
  */
object CacheLevelProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val ev = graft.Tables.t(spark, dir, "events")
    ev.count() // warm scan

    def trial(name: String, level: StorageLevel): Unit = {
      val parsed = graft.operators.LogPipeline.parseStaged(
          graft.operators.LogCorpus.withMessages(ev),
          graft.operators.LogPipeline.lambdaName(
            org.apache.spark.sql.functions.col("logGroup")),
          graft.operators.LogPipeline.lambdaVersion(
            org.apache.spark.sql.functions.col("logStream")),
          org.apache.spark.sql.functions.col("msg"),
          org.apache.spark.sql.functions.col("aws_region"))
        .filter(org.apache.spark.sql.functions.col("doc").isNotNull)
        .select(org.apache.spark.sql.functions.col("event_id"),
          org.apache.spark.sql.functions.col("doc.*"))
        .persist(level)
      val t0 = System.nanoTime()
      parsed.count()
      val build = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      parsed.count()
      val read = (System.nanoTime() - t1) / 1e9
      println(f"$name%-22s build ${build}%6.2fs  reread ${read}%6.2fs")
      parsed.unpersist(blocking = true)
    }
    for (i <- 1 to 2) {
      trial(s"MEMORY_AND_DISK #$i", StorageLevel.MEMORY_AND_DISK)
      trial(s"MEMORY_AND_DISK_SER #$i", StorageLevel.MEMORY_AND_DISK_SER)
      trial(s"DISK_ONLY #$i", StorageLevel.DISK_ONLY)
      trial(s"NONE(recompute) #$i", StorageLevel.NONE)
    }
    spark.stop()
  }
}

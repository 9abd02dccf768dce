package graft.tools

import org.apache.spark.sql.SparkSession

/** Minimal timing probe: session up, one parquet count, session down. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val t0 = System.nanoTime()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t1 = System.nanoTime()
    val n = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").count()
    val t2 = System.nanoTime()
    val e = graft.SparkEntry.entry(spark).count()
    val t3 = System.nanoTime()
    println(f"session=${(t1 - t0) / 1e9}%.1fs count($n)=${(t2 - t1) / 1e9}%.1fs entry($e)=${(t3 - t2) / 1e9}%.1fs")
    spark.stop()
  }
}

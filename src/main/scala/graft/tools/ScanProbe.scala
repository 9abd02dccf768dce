package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: events-scan cost breakdown (nanos-ts legacy read). */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    time("raw count")(println(raw.count()))
    time("raw all cols collect-ish")(println(raw.agg(count(col("props"))).head()))
    val ev = graft.Tables.events(spark, dir)
    time("events with ts rebuild")(println(ev.agg(count(col("ts"))).head()))
    time("events again")(println(ev.agg(count(col("ts"))).head()))
    time("k extract get_json_object")(println(
      ev.agg(count(get_json_object(col("props"), "$.k"))).head()))
    val m = graft.operators.LogCorpus.withMessages(ev)
    time("withMessages")(println(m.agg(count(col("msg"))).head()))
    time("withMessages again")(println(m.agg(count(col("msg"))).head()))
    println(raw.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("Scan")).take(2).mkString("\n").take(300))
    spark.stop()
  }
}

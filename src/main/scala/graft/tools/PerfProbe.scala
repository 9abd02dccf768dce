package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

import graft.Tables.t
import graft.operators.LogCorpus

/** Timing probes for the pipeline hot path at sf0.1. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%6.2fs  rows=$n")
    }

    val ev = t(spark, dir, "events")
    time("events.count")(ev.count())
    val m = LogCorpus.withMessages(ev).cache()
    time("withMessages cached")(m.count())
    val mt = MapType(StringType, StringType)
    time("from_json x1")(m.select(from_json(col("msg"), mt).as("j"))
      .select(count(when(col("j").isNotNull, 1))).head().getLong(0))
    time("from_json x6 distinct keys")(m.select(
      element_at(from_json(col("msg"), mt), "message").as("a"),
      element_at(from_json(col("msg"), mt), "requestId").as("b"),
      element_at(from_json(col("msg"), mt), "timestamp").as("c"),
      map_contains_key(from_json(col("msg"), mt), "message").as("d"),
      map_filter(from_json(col("msg"), mt), (k, _) => k =!= "x").as("e"),
      from_json(col("msg"), mt).as("f"))
      .select(count(when(col("a").isNotNull || col("d"), 1))).head().getLong(0))
    time("variant parse only")(m.select(expr("try_parse_json(msg)").as("v"))
      .select(count(when(col("v").isNotNull, 1))).head().getLong(0))
    time("variant + cast map")(m.select(
      expr("try_cast(try_parse_json(msg) AS map<string,string>)").as("j"))
      .select(count(when(col("j").isNotNull, 1))).head().getLong(0))
    time("variant + cast + type probe")(m.select(
      expr("try_cast(try_parse_json(msg) AS map<string,string>)").as("j"),
      expr("schema_of_variant(variant_get(try_parse_json(msg), '$.message'))").as("t"))
      .select(count(when(col("j").isNotNull && col("t") === "STRING", 1))).head().getLong(0))
    time("rlike structured")(m.select(count(when(
      col("msg").rlike(graft.operators.LogPipeline.structuredLogPattern), 1)))
      .head().getLong(0))
    time("parseStaged no persist")(
      graft.operators.LogPipeline.parseStaged(m,
          graft.operators.LogPipeline.lambdaName(col("logGroup")),
          graft.operators.LogPipeline.lambdaVersion(col("logStream")),
          col("msg"), col("aws_region"))
        .filter(col("doc").isNotNull).select(col("event_id"), col("doc.*"))
        .count())
    time("doc only, no classifier")(m.select(col("msg"),
      expr("try_cast(try_parse_json(msg) AS map<string,string>)").as("j"))
      .select(count(when(col("j").isNotNull, element_at(col("j"), "message")))).head().getLong(0))
    // DISK_ONLY persist vs a parquet stage + read-back for the same frame
    val rawParsed = graft.operators.LogPipeline.parseStaged(m,
        graft.operators.LogPipeline.lambdaName(col("logGroup")),
        graft.operators.LogPipeline.lambdaVersion(col("logStream")),
        col("msg"), col("aws_region"))
      .filter(col("doc").isNotNull).select(col("event_id"), col("doc.*"))
    val stageDir = java.nio.file.Files
      .createTempDirectory("perfprobe-parsed").toString
    try {
      time("parsed -> parquet stage")(
        { rawParsed.write.mode("overwrite").parquet(stageDir); 0L })
      time("parquet stage re-read")(spark.read.parquet(stageDir).count())
    } finally { // don't leak a parsed-corpus copy per probe run (ADVICE r18)
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(stageDir)
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverseIterator
          .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    time("parsed (current)")(LogCorpus.parsed(ev).count())
    time("parsed again")(LogCorpus.parsed(ev).count())
    val parsed = LogCorpus.parsed(ev)
    time("errorHist agg only")(parsed.groupBy(col("function_name"),
      col("severity"), coalesce(col("error_type"), lit("none")).as("et"))
      .agg(count(lit(1)), count_distinct(col("request_id"))).count())
    m.unpersist()
    spark.stop()
  }
}

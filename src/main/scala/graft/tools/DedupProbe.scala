package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-by-stage timing for the dedup pipeline at sf0.1. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = graft.Tables.t(spark, dir, "documents")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }

    time("docs count")(println(docs.count()))
    time("full ngram query")(println(
      graft.operators.Dedup.ngramJaccardPairs(docs, 3, 0.6).count()))
    val sig = graft.operators.Dedup.minhashSignatures(docs, 3, 32)
    time("signatures")(println(sig.count()))
    time("signatures again")(println(sig.count()))
    time("lsh query")(println(
      graft.operators.Dedup.minhashLshPairs(docs, 3, 32, 16, 0.6).count()))
    time("lsh query again")(println(
      graft.operators.Dedup.minhashLshPairs(docs, 3, 32, 16, 0.6).count()))
    spark.stop()
  }
}

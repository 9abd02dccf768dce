package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch recall probe for the impact-ordered tier: build a Zipf index
  * at N docs with the given impact knobs, serve a Zipf query batch
  * through the exact route and the wand route, and print per-budget mean
  * recall@k — the number TextIndexSpec's floor assertion pins.
  * Usage: WandProbe [nDocs] [nQueries] [blocks] [blockSize]
  */
object WandProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(2000L)
    val nQ = args.drop(1).headOption.map(_.toLong).getOrElse(50L)
    val blocks = args.drop(2).headOption.map(_.toInt).getOrElse(4)
    val bs = args.drop(3).headOption.map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(SynthFixtures.ensureZipfDocs(spark, nDocs))
    val dir = java.nio.file.Files.createTempDirectory("wand-probe").toString
    graft.operators.TextIndex.writeBm25Index(docs, dir, nBuckets = 16,
      impactBlocks = blocks, impactBlockSize = bs)
    val qs = SynthFixtures.zipfQueries(spark, nQ).persist()
    qs.count()
    val k = 10
    def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = ranks(graft.operators.TextIndex.bm25Route(qs, dir, k = k))
    for (b <- 1 to blocks) {
      val wand = ranks(
        graft.operators.TextIndex.bm25RouteWand(qs, dir, k = k, budget = b))
      val recalls = exact.map { case (q, ex) =>
        wand.getOrElse(q, Set.empty).count(ex) / ex.size.toDouble }
      println(f"budget=$b meanRecall@$k=${recalls.sum / recalls.size}%.3f " +
        f"minRecall=${recalls.min}%.3f nQ=${recalls.size}")
    }
    spark.stop()
  }
}

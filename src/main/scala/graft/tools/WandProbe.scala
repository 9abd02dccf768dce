package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch recall probe for the impact-ordered tier: build a Zipf index
  * at N docs with the given impact knobs, serve a Zipf query batch
  * through the exact route and the wand route, and print per-budget mean
  * recall@k — the number TextIndexSpec's floor assertion pins.
  *
  * Usage: WandProbe [nDocs] [nQueries] [blocks] [blockSize]
  *        WandProbe [nDocs] [nQueries] --fraction f [blockSize]
  *
  * `--fraction` builds the DF-PROPORTIONAL layout (r17) — one serve
  * (the whole stored head), printed with the served coverage column's
  * mean/min so the coverage-is-constant claim is visible next to the
  * recall it buys. The fraction layout (f = 0.2) is the DEFAULT when
  * no `blocks` positional is given (r18 — the steered new-index
  * choice, see [[graft.operators.TextIndex.writeBm25Index]]); a bare
  * third positional selects the fixed-block layout.
  */
object WandProbe {
  def main(args: Array[String]): Unit = {
    val varLen = args.contains("--var")
    // parse BY INDEX (ADVICE r17): drop the --fraction flag and its
    // value token positionally, never by string equality — a blockSize
    // equal to the fraction token must not be swallowed
    val fracIdx = args.indexOf("--fraction")
    val fracGiven = fracIdx >= 0
    require(!fracGiven || fracIdx + 1 < args.length,
      "--fraction needs a value")
    val positional = args.zipWithIndex.collect {
      case (a, i) if a != "--var" &&
        (!fracGiven || (i != fracIdx && i != fracIdx + 1)) => a
    }
    val nDocs = positional.headOption.map(_.toLong).getOrElse(2000L)
    val nQ = positional.drop(1).headOption.map(_.toLong).getOrElse(50L)
    val blocksGiven = !fracGiven && positional.length > 2
    val fraction =
      if (fracGiven) args(fracIdx + 1).toDouble
      else if (blocksGiven) 0.0
      else 0.2 // default: the df-proportional layout
    val blocks =
      if (fraction > 0) 0
      else positional.drop(2).headOption.map(_.toInt).getOrElse(4)
    val bs = (if (fraction > 0) positional.drop(2).headOption
              else positional.drop(3).headOption)
      .map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(
      if (varLen) SynthFixtures.ensureZipfDocsVar(spark, nDocs)
      else SynthFixtures.ensureZipfDocs(spark, nDocs))
    val dir = java.nio.file.Files.createTempDirectory("wand-probe").toString
    graft.operators.TextIndex.writeBm25Index(docs, dir, nBuckets = 16,
      impactBlocks = blocks, impactBlockSize = bs,
      impactFraction = fraction)
    val qs = SynthFixtures.zipfQueries(spark, nQ).persist()
    qs.count()
    val k = 10
    def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "rank", "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = ranks(graft.operators.TextIndex.bm25Route(qs, dir, k = k))
    def report(tag: String, served: org.apache.spark.sql.DataFrame): Unit = {
      val covs = served.select("qid", "coverage").distinct()
        .collect().flatMap(r => if (r.isNullAt(1)) None else Some(r.getDouble(1)))
      val wand = ranks(served)
      val recalls = exact.map { case (q, ex) =>
        wand.getOrElse(q, Set.empty[Long]).count(ex) / ex.size.toDouble }
      println(f"$tag meanRecall@$k=${recalls.sum / recalls.size}%.3f " +
        f"minRecall=${recalls.min}%.3f nQ=${recalls.size} " +
        f"meanCov=${covs.sum / math.max(1, covs.size)}%.3f " +
        f"minCov=${if (covs.isEmpty) 0.0 else covs.min}%.3f")
    }
    if (fraction > 0)
      report(f"fraction=$fraction%.2f",
        graft.operators.TextIndex.bm25RouteWand(qs, dir, k = k))
    else
      for (b <- 1 to blocks)
        report(s"budget=$b",
          graft.operators.TextIndex.bm25RouteWand(qs, dir, k = k, budget = b))
    // CANDIDATE recall: is the exact top-k contained in the top-C
    // ACCUMULATED candidates? The quantity a two-phase rerank serve pins
    // — candidate membership survives the tail-contribution losses that
    // degrade the pure accumulator ranking.
    for (c <- Seq(50, 100, 200, 500)) {
      val topC = graft.operators.TextIndex.bm25RouteWand(qs, dir, k = c)
      val cand = ranks(topC)
      val crec = exact.map { case (q, ex) =>
        cand.getOrElse(q, Set.empty[Long]).count(ex) / ex.size.toDouble }
      println(f"candK=$c candRecall@$k=${crec.sum / crec.size}%.3f " +
        f"min=${crec.min}%.3f")
    }
    spark.stop()
  }
}

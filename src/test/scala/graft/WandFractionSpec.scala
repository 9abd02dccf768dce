package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextIndex

/** The DF-PROPORTIONAL impact layout and the served coverage column
  * (r17) — the recall-bounded flat text-serving tier VERDICT r16 asked
  * for. Proves, on the LENGTH-VARIED Zipf corpus (the constant-length
  * [[graft.tools.SynthFixtures.zipfDocs]] makes every tf=1 posting of a
  * term an impact TIE, so no head ordering carries signal there — the
  * r17 measured plateau documented at
  * [[graft.tools.SynthFixtures.zipfDocsVar]]):
  *
  *  - recall@10 vs the exact tier holds >= 0.9 across a decade of
  *    corpus growth at a FIXED stored fraction (the coverage-is-recall
  *    law the fixed-block budget refutes: its recall decays 1.000 ->
  *    0.378 over the same law, WANDRECALL_r16);
  *  - the served `coverage` column never falls below the provisioned
  *    fraction, and on a FIXED-budget index it falls as df grows — the
  *    caller-visible regime signal (VERDICT r16 ask #4);
  *  - the escalation router (`minCoverage`) re-serves under-covered
  *    queries bit-identically to the exact route;
  *  - storage: per-term heads are cut at max(blockSize, ceil(df x
  *    fraction)) and appends keep the per-segment fraction.
  */
class WandFractionSpec extends SparkSpec {

  private val k = 10
  private val frac = 0.2

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-wandfrac").toString

  private def vdocs(n: Long): DataFrame =
    spark.read.parquet(graft.tools.SynthFixtures.ensureZipfDocsVar(spark, n))

  private def qs: DataFrame = graft.tools.SynthFixtures.zipfQueries(spark, 50L)

  private def ranks(df: DataFrame): Map[Long, Set[Long]] =
    df.select("qid", "rank", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private def meanRecall(exact: Map[Long, Set[Long]],
                         got: Map[Long, Set[Long]]): Double = {
    val rs = exact.map { case (q, ex) =>
      got.getOrElse(q, Set.empty[Long]).count(ex) / ex.size.toDouble }
    rs.sum / rs.size
  }

  /** (mean, min) of the served per-query coverage column. */
  private def covStats(df: DataFrame): (Double, Double) = {
    val cs = df.select("qid", "coverage").distinct().collect()
      .flatMap(r => if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    (cs.sum / cs.size, cs.min)
  }

  test("df-proportional heads pin recall >= 0.9 across a decade, " +
      "coverage never below the provisioned fraction") {
    Seq(2000L, 20000L).foreach { n =>
      val dir = tmp()
      TextIndex.writeBm25Index(vdocs(n), dir, impactFraction = frac)
      val exact = ranks(TextIndex.bm25Route(qs, dir, k = k))
      val served = TextIndex.bm25RouteWand(qs, dir, k = k)
      val (covMean, covMin) = covStats(served)
      val rec = meanRecall(exact, ranks(served))
      info(f"n=$n recall@$k=$rec%.3f covMean=$covMean%.3f covMin=$covMin%.3f")
      assert(rec >= 0.9,
        f"fraction-built serve must hold recall@$k >= 0.9 at $n docs " +
          f"(got $rec%.3f) — the coverage-is-recall law")
      assert(covMin >= frac - 1e-9,
        f"served coverage ($covMin%.3f) must never fall below the " +
          f"provisioned fraction ($frac)")
    }
  }

  test("coverage column falls as df outgrows a FIXED budget (the regime " +
      "signal), and the fraction layout keeps it pinned") {
    val covAt = Seq(2000L, 20000L).map { n =>
      val dir = tmp()
      TextIndex.writeBm25Index(vdocs(n), dir, impactBlocks = 2,
        impactBlockSize = 16)
      val (covMean, _) = covStats(TextIndex.bm25RouteWand(qs, dir, k = k,
        budget = 2))
      n -> covMean
    }.toMap
    info(f"fixed-budget coverage: 2k=${covAt(2000L)}%.3f " +
      f"20k=${covAt(20000L)}%.3f")
    assert(covAt(20000L) < covAt(2000L) * 0.5,
      "a fixed budget's served coverage must fall as the corpus (df) " +
        s"grows — got ${covAt(2000L)} -> ${covAt(20000L)}")
    assert(covAt(20000L) < frac,
      "at 20k the fixed 32-posting head must sit below the fraction " +
        "layout's pinned coverage")
  }

  test("escalation router: under-covered queries re-serve " +
      "bit-identically to the exact route with coverage 1.0; covered " +
      "queries keep their wand rows") {
    val n = 20000L
    val dir = tmp()
    TextIndex.writeBm25Index(vdocs(n), dir, impactBlocks = 2,
      impactBlockSize = 16)
    val minCov = 0.6
    val plain = TextIndex.bm25RouteWand(qs, dir, k = k, budget = 1)
    val plainRows = plain.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val covByQ = plain.select("qid", "coverage").distinct().collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap
    val esc = covByQ.filter { case (_, c) => !c.isNaN && c < minCov }.keySet
    assert(esc.nonEmpty && esc.size < covByQ.size,
      s"fixture must split: got ${esc.size} escalated of ${covByQ.size}")
    val routed = TextIndex.bm25RouteWand(qs, dir, k = k, budget = 1,
      minCoverage = minCov)
    val routedRows = routed.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(4)))
    val exactRows = TextIndex.bm25Route(qs, dir, k = k).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    routedRows.foreach { case (q, rank, doc, cov) =>
      if (esc(q)) {
        assert(exactRows((q, rank, doc)),
          s"escalated qid $q must serve the exact ranking")
        assert(cov == 1.0, s"escalated qid $q must report coverage 1.0")
      } else
        assert(plainRows((q, rank, doc)),
          s"covered qid $q must keep its wand ranking")
    }
    val exactOf = exactRows.groupBy(_._1)
    esc.foreach { q =>
      assert(routedRows.count(_._1 == q) == exactOf(q).size,
        s"escalated qid $q must serve the exact route's full row set")
    }
  }

  test("storage contract: per-term heads cut at max(blockSize, " +
      "ceil(df x fraction)); appends keep the per-segment fraction and " +
      "the served coverage") {
    val dir = tmp()
    val docs = vdocs(2000L)
    val bs = 16
    TextIndex.writeBm25Index(docs.filter(col("doc_id") % 2 === 0), dir,
      impactFraction = frac, impactBlockSize = bs)
    TextIndex.appendBm25Index(docs.filter(col("doc_id") % 2 === 1), dir)
    // per (term, seg): stored head rows vs that segment's own df
    val stored = graft.sources.StoredIndex.readTable(spark, s"$dir/impacts",
        "term STRING, doc_id BIGINT, tf BIGINT, dl BIGINT, ib INT, " +
          "seg INT, tb BIGINT")
      .groupBy("term", "seg").agg(count(lit(1)).as("head"))
    val segDf = graft.sources.StoredIndex.readTable(spark, s"$dir/termdf",
        "term STRING, df BIGINT, max_tf BIGINT, min_dl BIGINT, seg INT, " +
          "tb BIGINT")
      .select("term", "seg", "df")
    val bad = stored.join(segDf, Seq("term", "seg"))
      .filter(col("head") > greatest(lit(bs.toLong),
          ceil(col("df") * frac).cast("long")) ||
        col("head") < least(col("df"), lit(bs.toLong)))
      .count()
    assert(bad == 0,
      "every (term, segment) head must hold min(df, blockSize) <= rows " +
        "<= max(blockSize, ceil(df x fraction))")
    val served = TextIndex.bm25RouteWand(qs, dir, k = k)
    val (_, covMin) = covStats(served)
    assert(covMin >= frac - 1e-9,
      f"append-grown fraction index must keep served coverage >= $frac " +
        f"(got $covMin%.3f)")
  }

  test("refusals: fixed and fraction knobs are mutually exclusive; " +
      "fraction out of [0,1] refused") {
    val dir = tmp()
    val e1 = intercept[IllegalArgumentException] {
      TextIndex.writeBm25Index(vdocs(2000L), dir, impactBlocks = 2,
        impactFraction = 0.1)
    }
    assert(e1.getMessage.contains("alternative impact layouts"))
    val e2 = intercept[IllegalArgumentException] {
      TextIndex.writeBm25Index(vdocs(2000L), dir, impactFraction = 1.5)
    }
    assert(e2.getMessage.contains("impactFraction"))
  }
}

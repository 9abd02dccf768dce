package graft

import graft.queries.TextQueries

/** BM25 retrieval checked against a from-scratch driver-side recompute:
  * float-domain BM25 over the same tokenization, with the ranking (not the
  * scaled-integer scores) as the comparison surface — so the integral
  * clearing of denominators in the query under test is validated against
  * the textbook float formula it encodes.
  */
class RetrievalSpec extends SparkSpec {

  test("bm25: top-20 ranking matches the textbook float formula") {
    val got = TextQueries.textBm25(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.length).sum / n
    val (k1, b) = (1.2, 0.75)
    val terms = Seq("spark", "merge", "vector")
    val dfm = terms.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
    def score(toks: Seq[String]): Double = terms.map { qt =>
      val tf = toks.count(_ == qt).toDouble
      if (tf == 0) 0.0
      else ((n - dfm(qt) + 0.5) / (dfm(qt) + 0.5)) *
        (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * toks.length / avgdl))
    }.sum
    val expect = docs.map { case (id, toks) => (id, score(toks)) }
      .sortBy { case (id, s) => (-s, id) }.take(20)

    // same docs in the same order (float vs scaled-int could only disagree
    // on ties, and the fixture's Zipfian lengths make exact float ties on
    // distinct tf/dl profiles impossible away from zero)
    assert(got.map(_._1).toSeq == expect.map(_._1).toSeq,
      s"got ${got.map(_._1).toSeq} expected ${expect.map(_._1).toSeq}")
    // the scaled-integer score is the float score * 1e9, within the floor
    // loss of three integral divisions
    got.zip(expect).foreach { case ((_, si), (_, sf)) =>
      assert(math.abs(si - sf * 1e9) <= 3,
        s"scaled $si vs float ${sf * 1e9}")
    }
  }

  test("bm25 indexed: identical to the scan path, term pushdown reaches " +
      "the postings scan") {
    val idx = TextQueries.textBm25Indexed(spark, sf001)
    val scan = TextQueries.textBm25(spark, sf001)
    assert(idx.collect().toSeq == scan.collect().toSeq)
    // only the query terms' postings are read: the In(term, ...) predicate
    // is pushed into the parquet scan of the stored index
    val p = idx.queryExecution.executedPlan.toString
    assert(p.contains("In(term, [merge,spark,vector]") ||
      p.contains("In(term, [spark,merge,vector]"),
      s"expected term pushdown on the postings scan in:\n$p")
  }

  test("hybrid RRF: fused scores are exactly the legs' reciprocal ranks; " +
      "both-leg docs dominate their single-leg components") {
    val rows = graft.queries.TextQueries
      .textHybridRrf(spark, sf001).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val lex = Option(r.get(2)).map(_.asInstanceOf[Int])
      val vec = Option(r.get(3)).map(_.asInstanceOf[Int])
      assert(lex.nonEmpty || vec.nonEmpty, "a fused doc must come from a leg")
      // the fused score IS the integer RRF of the surviving ranks
      val expect = lex.map(x => 1000000000L / (60 + x)).getOrElse(0L) +
        vec.map(x => 1000000000L / (60 + x)).getOrElse(0L)
      assert(r.getLong(1) == expect, s"rrf mismatch for $r")
    }
    // fusion semantics: any doc present in BOTH legs outranks what its
    // lexical rank alone would score — RRF strictly adds evidence
    val both = rows.filter(r => r.get(2) != null && r.get(3) != null)
    both.foreach { r =>
      assert(r.getLong(1) > 1000000000L / (60 + r.getInt(2)))
    }
    // ranking sorted desc with doc_id ties
    val scores = rows.map(_.getLong(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("hybrid wand leg: full-coverage budget reproduces the exact fused " +
      "ranking; a truncating budget keeps fused recall above the floor") {
    import org.apache.spark.sql.functions._
    // sf0.001: the fixture's blockSize-256 floor exceeds every term's
    // per-segment df, so the wand lexical leg is COMPLETE and the fused
    // serve must equal the exact-leg hybrid bit for bit — the sharp
    // check that the swap changes only what the head cut truncates
    val exact = TextQueries.textHybridRoute(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val wand = TextQueries.textHybridWand(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(wand == exact,
      "a full-coverage wand leg must reproduce the exact fused ranking")
    // df-skewed Zipf corpus + clustered vectors, truncating budget (the
    // TextIndexSpec impact-tier fixture): the recall trade rides ONLY
    // the lexical evidence — nprobe = nCells keeps the vector leg exact
    // on both sides of the comparison
    val tmp = java.nio.file.Files.createTempDirectory("graft-hybridw")
      .toString
    val zdocs = graft.tools.SynthFixtures.zipfDocs(spark, 2000L)
    graft.operators.TextIndex.writeBm25Index(zdocs, s"$tmp/bm25",
      impactBlocks = 4)
    graft.operators.Similarity.ivfWriteIndex(
      graft.tools.SynthFixtures.clusteredEmbeddings(spark, 2000L),
      s"$tmp/ivf", nCells = 8)
    val qs = graft.tools.SynthFixtures.zipfQueries(spark, 50L)
      .withColumn("embedding",
        graft.tools.SynthFixtures.clusteredEmbedding(col("qid")))
    def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ex = ranks(graft.operators.TextIndex.hybridRoute(qs,
      s"$tmp/bm25", s"$tmp/ivf", k = 10, nprobe = 8))
    val ww = ranks(graft.operators.TextIndex.hybridRoute(qs,
      s"$tmp/bm25", s"$tmp/ivf", k = 10, nprobe = 8, wandBudget = 2))
    val recalls = ex.map { case (q, e) =>
      ww.getOrElse(q, Set.empty[Long]).count(e) / e.size.toDouble }
    val mean = recalls.sum / recalls.size
    info(f"zipf fused recall@10 at wandBudget 2 = $mean%.3f " +
      f"(min ${recalls.min}%.2f)")
    assert(mean >= 0.9,
      f"budget-2 lexical leg must keep mean fused recall@10 >= 0.9 " +
        f"(got $mean%.3f)")
    assert(recalls.min >= 0.5,
      f"no single query may fall below fused recall 0.5 " +
        f"(got ${recalls.min}%.2f)")
    // r18: the vector-leg probeFraction pass-through — fraction 1.0
    // probes every cell regardless of the nprobe floor, so the serve
    // must reproduce the nprobe = nCells fusion exactly
    val pf = ranks(graft.operators.TextIndex.hybridRoute(qs,
      s"$tmp/bm25", s"$tmp/ivf", k = 10, nprobe = 1, probeFraction = 1.0))
    assert(pf == ex,
      "probeFraction = 1.0 must reproduce the exhaustive-probe fusion")
  }
}

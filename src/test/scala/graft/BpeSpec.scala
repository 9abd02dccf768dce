package graft

import graft.operators.Bpe

/** BPE trainer/encoder: the Sennrich word-frequency formulation, pinned
  * against the textbook example plus train/encode consistency and the
  * distributed encode path.
  */
class BpeSpec extends SparkSpec {

  test("merges match the classic low/lower/newest/widest example") {
    val spark2 = spark
    import spark2.implicits._
    // Sennrich et al. fig. 1 corpus: low x5, lower x2, newest x6, widest x3
    val rows = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = rows.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = Bpe.train(docs, nMerges = 4)
    // highest-frequency pair first: (e,s) 9, then (es,t) 9, (est,</w>) 9,
    // then (l,o) 7
    assert(merges(0).left == "e" && merges(0).right == "s" &&
      merges(0).pairCount == 9)
    assert(merges(1).left == "es" && merges(1).right == "t")
    assert(merges(2).left == "est" && merges(2).right == Bpe.EndOfWord)
    assert(merges(3).left == "l" && merges(3).right == "o" &&
      merges(3).pairCount == 7)
  }

  test("encodeWord replays training merges: trained words reach their units") {
    val spark2 = spark
    import spark2.implicits._
    val docs = (Seq.fill(5)("low") ++ Seq.fill(6)("newest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = Bpe.train(docs, nMerges = 6)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    // after enough merges both words collapse to single units
    assert(Bpe.encodeWord("newest", ranks) == Seq("newest" + Bpe.EndOfWord))
    // unseen word: only learned merges apply
    val enc = Bpe.encodeWord("lowest", ranks)
    assert(enc.last.endsWith(Bpe.EndOfWord))
    assert(enc.mkString == "lowest" + Bpe.EndOfWord, "units concatenate back")
  }

  test("deterministic: retrain reproduces the identical merge table") {
    val docs = Tables.t(spark, sf001, "documents")
    val a = Bpe.train(docs, nMerges = 10)
    val b = Bpe.train(docs, nMerges = 10)
    assert(a == b)
  }

  test("distributed encodeStats: unit counts bounded by chars, >= words") {
    val docs = Tables.t(spark, sf001, "documents").limit(50)
    val merges = Bpe.train(docs, nMerges = 20)
    val stats = Bpe.encodeStats(docs, merges).collect()
    assert(stats.length == 50)
    stats.foreach { r =>
      val (words, units) = (r.getLong(1), r.getLong(2))
      assert(units >= words, "at least one unit per word")
      assert(r.getDouble(3) == units.toDouble / words)
    }
    // merges actually compress: fewer units than raw chars + end markers
    val docChars = docs.agg(org.apache.spark.sql.functions.sum(
      org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))).head().getLong(0)
    assert(stats.map(_.getLong(2)).sum < docChars)
  }
}

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

  test("byte-level mode: total over any input, round-trips non-Latin/emoji") {
    val spark2 = spark
    import spark2.implicits._
    // the GPT-2 base-alphabet property: 256 distinct printable chars
    assert(Bpe.byteToChar.distinct.length == 256)
    assert(Bpe.byteToChar.forall(c => !Character.isISOControl(c) && c != ' '))
    // encode with an EMPTY merge table is already total: every unit is a
    // single base-alphabet char, and decode inverts it exactly (byte-level
    // mode carries NO end marker — GPT-2 shape)
    val base = Bpe.byteToChar.map(_.toString).toSet
    val fixtures = Seq("héllo", "日本語", "🙂🙂", "привет", "naïve", "a")
    fixtures.foreach { w =>
      val units = Bpe.encodeWord(w, Map.empty, byteLevel = true)
      assert(units.forall(base.contains), s"non-base unit for $w: $units")
      assert(Bpe.decodeByteUnits(units) == w, s"round-trip failed for $w")
    }
    // TRAINED byte-level merges still round-trip (merged units concatenate
    // base chars; decode flattens them back to the same bytes) — including
    // for words the trainer never saw
    val docs = (Seq.fill(6)("日本語") ++ Seq.fill(4)("🙂🙂") ++
      Seq.fill(5)("привет")).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = Bpe.train(docs, nMerges = 12, byteLevel = true)
    assert(merges.nonEmpty)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    (fixtures :+ "日本語の🙂テキスト").foreach { w =>
      val units = Bpe.encodeWord(w, ranks, byteLevel = true)
      assert(Bpe.decodeByteUnits(units) == w, s"trained round-trip: $w")
    }
    // trained words compress below their byte length
    val jp = Bpe.encodeWord("日本語", ranks, byteLevel = true)
    assert(jp.length < "日本語".getBytes("UTF-8").length,
      s"merges should compress the trained word, got $jp")
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

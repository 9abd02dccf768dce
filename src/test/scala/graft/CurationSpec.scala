package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Curation operators: sequence packing, deterministic sampling,
  * contamination screening, end-to-end curation — on sf0.001 documents.
  */
class CurationSpec extends SparkSpec {
  private lazy val docs = Tables.t(spark, sf001, "documents")

  test("packSequences conserves tokens and packs contiguous doc ranges") {
    val budget = 512
    val packed = Curation.packSequences(docs, budgetTokens = budget,
      shards = 4).cache()
    val totalPacked = packed.agg(sum("sum_tokens")).head().getLong(0)
    val totalDocs = docs.select(Curation.tokenCount(col("text")).as("t"))
      .agg(sum("t")).head().getLong(0)
    assert(totalPacked == totalDocs, "every token lands in exactly one seq")
    // within a shard, sequences partition the doc ids into contiguous,
    // non-overlapping ranges (concat-and-chop lays docs out in id order)
    val rows = packed.orderBy("shard", "seq")
      .select("shard", "seq", "first_doc", "last_doc", "n_docs")
      .collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      rs.sortBy(_.getLong(1)).sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(3) < b.getLong(2),
          "doc ranges of consecutive seqs must not overlap")
        case _ =>
      }
    }
    // a sequence never starts past the doc that spans its boundary: every
    // seq's doc count is >= 1 and offsets are monotone by construction
    assert(rows.forall(_.getLong(4) >= 1))
  }

  test("packSequences seq assignment matches start-offset DIV budget") {
    val packed = Curation.packSequences(docs, budgetTokens = 512, shards = 1)
    // one shard: global offsets. Recompute independently on the driver.
    val toks = docs.orderBy("doc_id")
      .select(col("doc_id"), Curation.tokenCount(col("text")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var off = 0L
    val expected = toks.map { case (id, t) =>
      val seq = off / 512; off += t; (id, seq)
    }.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val got = packed.select("seq", "n_docs").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected)
  }

  test("stratifiedSample respects the per-stratum quota and is deterministic") {
    val s1 = Curation.stratifiedSample(docs, perStratum = 10)
    val quota = s1.groupBy("lang").agg(count(lit(1)).as("n"),
      max("rn").as("mx")).collect()
    assert(quota.forall(r => r.getLong(1) <= 10 && r.getInt(2) <= 10))
    val a = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Curation.stratifiedSample(docs, perStratum = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "content-hash order makes the draw reproducible")
  }

  test("hashSampleStats is a fixed-rate narrow filter, stable across reruns") {
    val s = Curation.hashSampleStats(docs).cache()
    val (total, sampled) = s.agg(sum("n_total"), sum("n_sampled")).head() match {
      case r => (r.getLong(0), r.getLong(1))
    }
    assert(sampled > 0 && sampled < total)
    // 1/8 expected rate; generous tolerance for a 500-doc corpus
    assert(sampled.toDouble / total > 0.04 && sampled.toDouble / total < 0.25)
    val again = Curation.hashSampleStats(docs)
    assert(s.exceptAll(again).count() == 0)
  }

  test("splitStats partitions the corpus and keeps dup texts in one split") {
    val s = Curation.splitStats(docs).collect()
    assert(s.map(_.getAs[String]("split")).toSet == Set("train", "val", "test"))
    assert(s.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // duplicate text ends up in the same split as its original: split by
    // content hash means adding a copy only increments that split's count
    val withDup = docs.unionByName(
      docs.limit(1).withColumn("doc_id", lit(999004L)))
    val before = s.map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = Curation.splitStats(withDup).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after.values.sum == before.values.sum + 1)
    assert(after.count { case (k, v) => v != before(k) } == 1)
  }

  test("contamination flags a planted benchmark copy at bench_frac 1.0") {
    // plant: doc 0 is in the benchmark slice (0 % 50 == 0); give the corpus
    // an exact copy under a fresh id that is NOT in the slice
    val planted = docs.unionByName(
      docs.filter(col("doc_id") === 0)
        .withColumn("doc_id", lit(999001L)))
    val out = Curation.contamination(planted,
        benchFilter = col("id") % 50 === 0, k = 3, minOverlap = 3)
      .filter(col("bench_doc") === 0 && col("corpus_doc") === 999001L)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("bench_frac") == 1.0,
      "an exact copy shares every shingle of the benchmark doc")
  }

  test("curatedStats drops short docs and collapses exact duplicates") {
    val withDup = docs.unionByName(
      docs.filter(col("doc_id") === 1).withColumn("doc_id", lit(999002L)))
    val base = Curation.curatedStats(docs).agg(sum("n_docs")).head().getLong(0)
    val dup = Curation.curatedStats(withDup).agg(sum("n_docs")).head().getLong(0)
    assert(dup == base, "an exact duplicate must not survive curation")
    val tiny = spark.createDataFrame(Seq(
      (999003L, "too short", "en", "srcX", 9L))).toDF(
      "doc_id", "text", "lang", "source", "n_chars")
    val withTiny = docs.unionByName(tiny)
    val t = Curation.curatedStats(withTiny).agg(sum("n_docs")).head().getLong(0)
    assert(t == base, "a below-floor doc must not survive curation")
  }

  test("chunkDocs covers every character with the declared overlap") {
    val chunked = Curation.chunkDocs(docs, chunkChars = 160,
      strideChars = 120).cache()
    // every doc chunks; chunk 0 starts at 1; consecutive starts differ by
    // exactly the stride; the final chunk reaches the end of the text
    assert(chunked.select("doc_id").distinct().count() == docs.count())
    val lens = docs.select(col("doc_id"), length(col("text")).as("len"))
    val last = chunked.groupBy("doc_id")
      .agg(max(col("start") + col("chunk_len") - 1).as("covered"),
        count(lit(1)).as("n_chunks"), max("chunk_no").as("max_no"))
      .join(lens, "doc_id")
    assert(last.filter(col("covered") =!= col("len")).count() == 0,
      "chunks must cover the doc exactly to its last character")
    assert(last.filter(col("n_chunks") =!= col("max_no") + 1).count() == 0,
      "chunk numbering must be dense from 0")
    // every chunk is exactly chunkChars long unless the text ends first
    // (with overlap, the last SEVERAL chunks can truncate, not just one)
    val withLen = chunked.join(lens, "doc_id")
    assert(withLen.filter(col("chunk_len") =!=
      least(lit(160L), col("len") - col("start") + 1)).count() == 0)
    chunked.unpersist(blocking = false)
  }

  test("domainMixSample applies per-source rates with default fallback") {
    val out = Curation.domainMixSample(docs,
      rates = Map("src0" -> "0", "src1" -> "g"), defaultRate = "8")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(out("src0")._2 == 0, "rate '0' keeps nothing")
    assert(out("src1")._2 == out("src1")._1, "rate 'g' (> any hex) keeps all")
    // default-rate sources keep a strict, nonempty subset (md5 is uniform;
    // '8' is a 1/2 rate over 25 docs — all-or-nothing has p ~ 2*2^-25)
    val dflt = out.filterKeys(k => k != "src0" && k != "src1").values
    assert(dflt.forall { case (tot, kept) => kept > 0 && kept < tot })
  }

  test("lineDedup strips cross-corpus boilerplate segments, reassembles the rest") {
    val spark2 = spark
    import spark2.implicits._
    val banner = "one two three four five six seven eight nine ten"
    val rows = Seq(
      1L -> s"$banner alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> s"$banner lambda mu nu xi omicron pi rho sigma tau upsilon",
      3L -> s"$banner phi chi psi omega aleph beth gimel daleth he vav",
      4L -> banner, // ALL segments boilerplate -> empty kept_text
      5L -> "unique words that never repeat anywhere in this tiny corpus")
    val out = Curation.lineDedup(rows.toDF("doc_id", "text"),
      segWords = 10, dupMin = 3).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 1L,
      "alpha beta gamma delta epsilon zeta eta theta iota kappa")))
    assert(out(4L) == ((1L, 0L, "")), "fully-boilerplate doc stays, empty")
    assert(out(5L) == ((1L, 1L,
      "unique words that never repeat anywhere in this tiny corpus")))
  }

  test("lineDedup with an unreachable dupMin is the identity (reassembly exact)") {
    // round-trip invariant: segmentation + reassembly reproduces every
    // document byte-for-byte when nothing is duplicated enough to drop
    val out = Curation.lineDedup(docs, segWords = 10, dupMin = Int.MaxValue)
      .select(col("doc_id"), col("kept_text"))
    val joined = docs.select(col("doc_id"), col("text"))
      .join(out, "doc_id")
      .filter(col("text") =!= col("kept_text"))
    assert(joined.count() == 0)
  }

  test("substringDedup finds the offset span that lineDedup provably misses") {
    val spark2 = spark
    import spark2.implicits._
    // a 25-word span shared by two docs at DIFFERENT offsets (3 and 7
    // words in) — no 10-word tumbling boundary of one doc aligns the span
    // with the other doc's, so tumbling segment hashes see nothing, while
    // stride-1 sliding windows tile the span and merge to one maximal span
    val span = (1 to 25).map(i => s"s$i").mkString(" ")
    val rows = Seq(
      1L -> s"p1 p2 p3 $span q1 q2 q3 q4 q5 q6 q7",
      2L -> s"r1 r2 r3 r4 r5 r6 r7 $span t1 t2 t3",
      3L -> "filler words with no duplication at all present here today now")
    val df = rows.toDF("doc_id", "text")
    // tumbling: nothing duplicated (dupMin 2 — most permissive)
    val line = Curation.lineDedup(df, segWords = 10, dupMin = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(line(1L)._1 == line(1L)._2 && line(2L)._1 == line(2L)._2,
      "tumbling segments must all survive — the duplicated span is invisible")
    // sliding: the full 25-token span is recovered as ONE merged span each
    val sub = Curation.substringDedup(df, segWords = 10, dupMin = 2)
      .collect().map(r =>
        r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    assert(sub(1L) == ((35, 25L, 1L)),
      s"doc 1: 25 covered tokens in 1 maximal span, got ${sub.get(1L)}")
    assert(sub(2L) == ((35, 25L, 1L)),
      s"doc 2: 25 covered tokens in 1 maximal span, got ${sub.get(2L)}")
    assert(!sub.contains(3L), "the undup'd doc emits no row")
  }

  test("substringDedup merges overlapping windows and splits disjoint spans") {
    val spark2 = spark
    import spark2.implicits._
    // two DISJOINT shared spans in one doc -> two islands; the span copies
    // sit at different offsets in the partner docs
    val a = (1 to 12).map(i => s"a$i").mkString(" ")
    val b = (1 to 12).map(i => s"b$i").mkString(" ")
    val mid = (1 to 5).map(i => s"m$i").mkString(" ")
    val rows = Seq(
      1L -> s"$a $mid $b",
      2L -> s"x1 x2 $a y1 y2 y3 y4 y5 y6 y7 y8 y9 y10",
      3L -> s"z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 $b w1 w2")
    val sub = Curation.substringDedup(rows.toDF("doc_id", "text"),
        segWords = 10, dupMin = 2)
      .collect().map(r =>
        r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    assert(sub(1L) == ((29, 24L, 2L)),
      s"doc 1: two disjoint 12-token spans, got ${sub.get(1L)}")
    assert(sub(2L) == ((24, 12L, 1L)) && sub(3L) == ((25, 12L, 1L)))
  }

  test("substringDedupApply removes exactly the shared span, passes others through") {
    val spark2 = spark
    import spark2.implicits._
    val span = (1 to 25).map(i => s"s$i").mkString(" ")
    val rows = Seq(
      1L -> s"p1 p2 p3 $span q1 q2 q3 q4 q5 q6 q7",
      2L -> s"r1 r2 r3 r4 r5 r6 r7 $span t1 t2 t3",
      3L -> "filler words with no duplication at all present here today now")
    val out = Curation.substringDedupApply(rows.toDF("doc_id", "text"),
        segWords = 10, dupMin = 2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) == "p1 p2 p3 q1 q2 q3 q4 q5 q6 q7",
      "doc 1 rebuilds to its pre-splice text")
    assert(out(2L) == "r1 r2 r3 r4 r5 r6 r7 t1 t2 t3")
    assert(out(3L) == rows(2)._2, "undup'd doc passes through byte-identical")
  }

  test("lmQualityCut drops gibberish docs on the exact-integer threshold") {
    val spark2 = spark
    import spark2.implicits._
    val common = "the cat sat on the mat and the dog sat on the rug"
    val rows = Seq(
      (1L, "en", common), (2L, "en", common), (3L, "fr", common),
      (4L, "en", "zzq1 zzq2 zzq3 zzq4 zzq5 zzq6 zzq7 zzq8 zzq9 zzq10"))
    val out = Curation.lmQualityCut(
        rows.toDF("doc_id", "lang", "text"), vocabTop = 50000,
        rareMax = 1, rareFracDen = 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // docs 1-3 share every bigram (count 3 > rareMax) -> survive;
    // doc 4's bigrams are all unseen-once -> rare frac 1 > 1/20 -> cut
    assert(out == Map("en" -> 2L, "fr" -> 1L))
  }

  test("repetition metrics match hand counts; plan is shuffle-free") {
    val spark2 = spark
    import spark2.implicits._
    val rep = graft.operators.TextAnalysis.repetition(
      Seq(10L -> "a a a b", 11L -> "x y x y x").toDF("doc_id", "text"))
    val plan = rep.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"repetition must be narrow:\n$plan")
    val m = rep.collect().map(r => r.getLong(0) -> r).toMap
    // "a a a b": tokens 4, max tok 3; bigrams [a a, a a, a b]
    assert(m(10L).getInt(1) == 4 && m(10L).getInt(2) == 3)
    assert(m(10L).getDouble(3) == 3.0 / 4)
    assert(m(10L).getDouble(4) == 2.0 / 3 && m(10L).getDouble(5) == 2.0 / 3)
    // "x y x y x": bigrams [x y, y x, x y, y x] -> all repeated
    assert(m(11L).getInt(2) == 3)
    assert(m(11L).getDouble(4) == 2.0 / 4 && m(11L).getDouble(5) == 1.0)
  }

  test("qualityQuantileCut drops below-threshold docs exactly") {
    val out = Curation.qualityQuantileCut(docs, p = 0.25)
    val cut = out.select("cut").head().getDouble(0)
    val expected = docs
      .select(Curation.tokenCount(col("text")).as("t"))
      .filter(col("t") >= cut).count()
    assert(out.agg(sum("n_docs")).head().getLong(0) == expected)
    // the threshold is a real quantile: at most 25% of docs fall below it
    val below = docs.select(Curation.tokenCount(col("text")).as("t"))
      .filter(col("t") < cut).count()
    assert(below <= (docs.count() * 0.25).ceil.toLong)
  }

  test("tokenBudgetMix: bucket-cutoff selection equals the sequential " +
      "prefix-sum definition across fill, zero and keep-whole budgets") {
    val budgets = Map("src0" -> 300L, "src1" -> 0L, "src2" -> 999999L)
    val got = Curation.tokenBudgetMix(docs, budgets).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // sequential replay of the definition on the driver: hash order,
    // keep while the running total BEFORE the doc is under budget
    val rows = docs.filter(col("source").isin("src0", "src1", "src2"))
      .select(col("source"), col("doc_id"), md5(col("text")).as("h"),
        Curation.tokenCount(col("text")).as("t"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = budgets.flatMap { case (s, b) =>
      var cum = 0L
      val sel = rows.filter(_._1 == s).sortBy(r => (r._3, r._2))
        .filter { case (_, _, _, t) =>
          val keep = cum < b; cum += t; keep }
      if (sel.isEmpty) None
      else Some(s -> ((b, sel.size.toLong, sel.map(_._4).sum,
        sel.map(_._3).max)))
    }
    assert(got == expected,
      "the two-pass bucket-cutoff plan must select exactly the " +
        "sequential definition's document set")
    // the fill contract: a budget the corpus can cover lands AT or PAST
    // the budget (the crossing doc is kept), never under
    assert(got("src0")._3 >= 300L && got("src2")._3 < 999999L)
  }

  test("tokenBudgetMix: randomized corpora + budgets equal the " +
      "sequential replay (duplicate texts, tiny/zero/huge budgets)") {
    val spark2 = spark
    import spark2.implicits._
    for (seed <- Seq(7, 41)) {
      val rnd = new scala.util.Random(seed)
      val vocab = (0 until 30).map(i => s"w$i")
      def text() = Vector.fill(1 + rnd.nextInt(12))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")
      // duplicate texts across and within sources: identical md5 keys,
      // doc_id must break the tie identically on both sides
      val texts = Vector.fill(25)(text())
      val rows = (0 until 120).map(i =>
        (i.toLong, s"s${rnd.nextInt(5)}", texts(rnd.nextInt(texts.size))))
      val docs = rows.toDF("doc_id", "source", "text")
      val budgets = Map("s0" -> 0L, "s1" -> (1 + rnd.nextInt(5)).toLong,
        "s2" -> (20 + rnd.nextInt(60)).toLong, "s3" -> 100000L)
      val got = Curation.tokenBudgetMix(docs, budgets).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
        .toMap
      val hashed = docs.select(col("source"), col("doc_id"),
          md5(col("text")).as("h"), Curation.tokenCount(col("text")).as("t"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2),
          r.getLong(3)))
      val expected = budgets.flatMap { case (s, b) =>
        var cum = 0L
        val sel = hashed.filter(_._1 == s).sortBy(r => (r._3, r._2))
          .filter { case (_, _, _, t) =>
            val keep = cum < b; cum += t; keep }
        if (sel.isEmpty) None
        else Some(s -> ((b, sel.size.toLong, sel.map(_._4).sum,
          sel.map(_._3).max)))
      }
      assert(got == expected, s"seed $seed: bucket-cutoff selection " +
        "diverged from the sequential definition")
    }
  }

  test("tokenBudgetMix: an exact-boundary budget keeps no crossing doc; " +
      "selection is invariant to physical partitioning") {
    val spark2 = spark
    import spark2.implicits._
    val syn = (1 to 40).map(i =>
        (i.toLong, "s", ("tok " * (i % 5 + 1)).trim))
      .toDF("doc_id", "source", "text")
    val ordered = syn
      .select(col("doc_id"), md5(col("text")).as("h"),
        Curation.tokenCount(col("text")).as("t"))
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
      .sortBy(r => (r._1, r._2))
    // budget exactly the first three docs' tokens: the fourth doc's
    // running-total-before EQUALS the budget — strictly-under keeps it out
    val b = ordered.take(3).map(_._3).sum
    val out = Curation.tokenBudgetMix(syn, Map("s" -> b)).head()
    assert(out.getLong(2) == 3L && out.getLong(3) == b,
      s"exact-boundary budget $b must keep exactly the first 3 docs")
    val a1 = Curation.tokenBudgetMix(syn, Map("s" -> b)).collect().toSeq
    val a2 = Curation.tokenBudgetMix(syn.repartition(13), Map("s" -> b))
      .collect().toSeq
    assert(a1 == a2, "selection must not depend on physical partitioning")
  }

  test("tokenBudgetMixEpochs: the closed form equals an explicit " +
      "cyclic-stream replay across first-doc, sub-epoch, exact-boundary " +
      "and multi-epoch budgets") {
    val spark2 = spark
    import spark2.implicits._
    val syn = (1 to 12).map(i =>
        (i.toLong, "s", ("tok " * (i % 4 + 1)).trim))
      .toDF("doc_id", "source", "text")
    // one period of the cyclic stream: token counts in (h, id) order
    val period = syn
      .select(col("doc_id"), md5(col("text")).as("h"),
        Curation.tokenCount(col("text")).as("t"))
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
      .sortBy(r => (r._1, r._2)).map(_._3)
    val total = period.sum
    // the DEFINITION: walk the infinite cyclic stream, select while the
    // running total BEFORE the doc is strictly under budget
    def cyclic(b: Long): (Long, Long) = {
      var cum = 0L; var n = 0L; var s = 0L; var i = 0
      while (cum < b) {
        val t = period(i % period.length)
        n += 1; s += t; cum += t; i += 1
      }
      (n, s)
    }
    for (b <- Seq(1L, total / 2, 3 * total, 2 * total + total / 3)) {
      val row = Curation.tokenBudgetMixEpochs(syn, Map("s" -> b)).head()
      val (en, es) = cyclic(b)
      assert(row.getLong(2) == b / total && row.getLong(3) == en &&
        row.getLong(4) == es,
        s"budget $b: closed form gave $row, cyclic replay gives " +
          s"(${b / total} epochs, $en rows, $es tokens)")
    }
  }

  test("budget gate: one batch from an empty gate admits exactly the " +
      "batch mix; the second batch decides against committed fills; " +
      "all-rejected learns are no-ops") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-budget-gate").toString
    // s0 crosses in batch 1, s1 crosses in batch 2, s2 is unbudgeted
    val syn = (1 to 60).map(i =>
        (i.toLong, s"s${i % 3}", ("tok " * (i % 7 + 1)).trim))
      .toDF("doc_id", "source", "text")
    val budgets = Map("s0" -> 25L, "s1" -> 55L)
    Curation.writeBudgetGate(spark, dir, budgets)
    def admitted(d: org.apache.spark.sql.DataFrame) =
      d.filter(col("admitted")).groupBy("source")
        .agg(count(lit(1)).as("n"), sum("tokens").as("s")).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def mixOf(b: org.apache.spark.sql.DataFrame, bu: Map[String, Long]) =
      Curation.tokenBudgetMix(b, bu).collect()
        .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val b1 = syn.filter(col("doc_id") % 2 === 0)
    val d1 = Curation.budgetRoute(b1, dir).cache()
    val adm1 = admitted(d1)
    // the bridge: an empty gate's single batch IS the batch mix
    assert(adm1 == mixOf(b1, budgets),
      "one batch through an empty gate must admit exactly the batch mix")
    // unbudgeted arrivals are answered (rejected), never dropped
    assert(d1.filter(col("source") === "s2").count() > 0 &&
      d1.filter(col("source") === "s2" && col("admitted")).count() == 0)
    val rec1 = Curation.recordBudgetFills(d1, dir)
    assert(rec1 == adm1.values.map(_._2).sum,
      "the learn must record exactly the admitted tokens")
    // batch 2: decisions equal the batch mix under the REDUCED budgets
    val b2 = syn.filter(col("doc_id") % 2 === 1)
    val d2 = Curation.budgetRoute(b2, dir).cache()
    val reduced = budgets.map { case (s, b) =>
      s -> math.max(0L, b - adm1.get(s).map(_._2).getOrElse(0L)) }
    assert(admitted(d2) == mixOf(b2, reduced),
      "batch 2 must decide exactly as the mix over the remaining budget")
    // s0 crossed in batch 1: nothing more admits
    assert(d2.filter(col("source") === "s0" && col("admitted")).count() == 0)
    Curation.recordBudgetFills(d2, dir)
    // an all-rejected batch (exhausted + unbudgeted sources only) is a
    // NO-OP: no fills segment, no new version
    val gens = graft.sources.StoredIndex.nextSeg(dir, "fills", "gen-")
    val b3 = syn.filter(col("source") =!= "s1")
    val d3 = Curation.budgetRoute(b3, dir)
    assert(d3.filter(col("admitted")).count() == 0)
    assert(Curation.recordBudgetFills(d3, dir) == 0L)
    assert(graft.sources.StoredIndex.nextSeg(dir, "fills", "gen-") == gens,
      "an all-rejected learn must not write a fills segment")
  }

  test("budget gate: a crashed learn rolls back atomically and the " +
      "re-run records exactly once (no double count)") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-budget-crash").toString
    Curation.writeBudgetGate(spark, dir, Map("s" -> 10L))
    def doc(id: Long) = Seq((id, "s", "tok tok tok tok tok tok"))
      .toDF("doc_id", "source", "text") // 6 tokens
    // kill the learn at both windows: after the stage write, and after
    // the segment moved in but before the manifest commit (where a
    // non-atomic design double-counts on re-run)
    for (point <- Seq("budget-staged", "budget-before-commit")) {
      graft.sources.IndexCommit.failpoint =
        p => if (p == point) throw new RuntimeException(s"boom:$p")
      val thrown = try {
          Curation.recordBudgetFills(Curation.budgetRoute(doc(1L), dir), dir)
          false
        } catch { case e: RuntimeException
          if e.getMessage == s"boom:$point" => true }
        finally graft.sources.IndexCommit.failpoint = _ => ()
      assert(thrown, s"failpoint $point must fire")
      assert(graft.sources.IndexCommit.versionsOf(dir) == Seq(0),
        s"a learn crashed at $point must publish nothing")
    }
    // the re-run lands ONCE: filled becomes exactly 6, so a second
    // 6-token doc still admits (6 + 0 < 10) — a double-counted crash
    // leftover would have filled 12 and rejected it
    Curation.recordBudgetFills(Curation.budgetRoute(doc(1L), dir), dir)
    assert(graft.sources.IndexCommit.versionsOf(dir) == Seq(0, 1))
    val d2 = Curation.budgetRoute(doc(2L), dir).collect().head
    assert(d2.getBoolean(3),
      "after one committed 6-token learn of a 10-token budget the next " +
        "6-token doc must still admit — filled must be exactly 6")
    Curation.recordBudgetFills(Curation.budgetRoute(doc(2L), dir), dir)
    assert(!Curation.budgetRoute(doc(3L), dir).collect().head.getBoolean(3),
      "past the budget the gate must reject")
  }

  test("budget gate: the fills LSM folds past the segment budget with " +
      "decisions unchanged; the fold is idempotent") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-budget-fold").toString
    Curation.writeBudgetGate(spark, dir, Map("a" -> 100L))
    for (i <- 1 to 10) {
      val b = Seq((i.toLong, "a", "tok tok")).toDF("doc_id", "source", "text")
      Curation.recordBudgetFills(Curation.budgetRoute(b, dir), dir)
    }
    val probe = Seq((99L, "a", "tok tok tok"), (100L, "b", "tok"))
      .toDF("doc_id", "source", "text")
    val before = Curation.budgetRoute(probe, dir).orderBy("doc_id")
      .collect().toSeq
    val folded = Curation.compactBudgetFills(spark, dir)
    assert(folded == 10, s"all ten learn segments must fold (got $folded)")
    val t = new graft.sources.IndexTxn(dir)
    assert(graft.sources.StoredIndex.segCount(t, "fills", "gen-") == 1,
      "the fold must leave exactly one fills segment")
    val after = Curation.budgetRoute(probe, dir).orderBy("doc_id")
      .collect().toSeq
    assert(after == before,
      "the fold must not change any admission decision")
    assert(Curation.compactBudgetFills(spark, dir) == 0,
      "a second fold must be a no-op")
  }

  test("normalizeDocs: NFC composes, control strips, Unicode whitespace collapses") {
    val spark2 = spark
    import spark2.implicits._
    // NFD cafe+combining-acute, BEL, NBSP run, LINE SEP, IDEOGRAPHIC SPACE,
    // trailing NBSP -- every class the planted curate_normalize fixture uses
    val raw = "cafe\u0301 \u0007 hi\u00a0\u00a0over\u2028the\u3000line \u00a0"
    val out = Curation.normalizeDocs(Seq((1L, raw)).toDF("doc_id", "text"))
      .head()
    assert(out.getString(1) == "caf\u00e9 hi over the line",
      s"got [${out.getString(1)}]")
    // audit math: n_chars_norm counts the NFC'd text, n_removed the delta
    assert(out.getLong(2) == "caf\u00e9 hi over the line".length)
    assert(out.getLong(3) == raw.length - out.getLong(2))
    // pure-ASCII fast path is the identity
    val clean = Curation.normalizeDocs(Seq((2L, "plain ascii text"))
      .toDF("doc_id", "text")).head()
    assert(clean.getString(1) == "plain ascii text" && clean.getLong(3) == 0L)
  }

  test("normalize-then-hash collapses an NFD/NFC dup pair dedup_exact misses") {
    val spark2 = spark
    import spark2.implicits._
    val pair = Seq(1L -> "le caf\u00e9 du matin",          // NFC
                   2L -> "le cafe\u0301 du matin")         // NFD, same glyphs
      .toDF("doc_id", "text")
    // raw bytes differ -> exact dedup sees two singleton groups
    val rawGroups = graft.operators.Dedup.exactDedup(pair)
    assert(rawGroups.count() == 2 &&
      rawGroups.filter(col("n_copies") > 1).count() == 0,
      "byte-level exact dedup must miss the NFD/NFC pair")
    // normalize first -> one group of two, keeper = min id
    val norm = Curation.normalizeDocs(pair)
      .select(col("doc_id"), col("norm").as("text"))
    val dup = graft.operators.Dedup.exactDedup(norm)
      .filter(col("n_copies") > 1).collect()
    assert(dup.length == 1 && dup(0).getLong(1) == 1L &&
      dup(0).getLong(2) == 2L)
  }

  test("nfc_normalize is SQL-registered for spark.sql users") {
    graft.functions.GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT nfc_normalize('cafe\u0301'), nfc_normalize(NULL)").head()
    assert(got.getString(0) == "caf\u00e9" && got.isNullAt(1))
  }

  test("curatePipeline: every stage bites once, one shared shingle index") {
    val spark2 = spark
    import spark2.implicits._
    def words(p: String, lo: Int, hi: Int) =
      (lo to hi).map(i => s"$p$i").mkString(" ")
    val a = words("a", 1, 24)            // clean unique survivor
    val b = words("b", 1, 24)            // near-dup keeper...
    val bNear = words("b", 1, 23) + " zz" // ...vs J=21/23 near-dup (drops)
    val bench = words("c", 1, 24)        // held-out slice (97 % 97 == 0)
    // shares the c1..c6 run with bench -> 4 shingles >= minOverlap 3
    val contaminated =
      words("d", 1, 10) + " " + words("c", 1, 6) + " " + words("d", 11, 24)
    val short = "s1 s2 s3"               // under the 20-token floor
    val messyA = "\u0007 " + a + "\u00a0 \u2028" // normalizes to exactly a
    val docs = Seq(1L -> a, 2L -> b, 3L -> bNear, 4L -> contaminated,
      5L -> short, 97L -> bench, 101L -> messyA).toDF("doc_id", "text")
    val before = Caches.counters
    val out = Curation.curatePipeline(docs)
      .orderBy("shard", "seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // survivors: 1 (messy copy 101 deduped away post-normalize) and 2
    // (near-dup 3 dropped); 4 contaminated, 5 floored, 97 held out
    assert(out.toSeq == Seq((1L, 0L, 1L, 24L, 1L, 1L),
      (2L, 0L, 1L, 24L, 2L, 2L)), s"got ${out.toSeq}")
    // the composition claim: the df-cut shingle index over the curated
    // frame built ONCE (one miss) and every later consumer \u2014 the LSH-free
    // near-dup verify and both sides of the contamination screen \u2014 hit it
    def delta(fam: String): (Long, Long) = {
      val (h0, m0) = before.getOrElse(fam, (0L, 0L))
      val (h, m) = Caches.counters(fam)
      (h - h0, m - m0)
    }
    val (shH, shM) = delta("dedup-shingles")
    assert(shM == 1 && shH >= 2,
      s"shared shingle index must build once: hits=$shH misses=$shM")
    val (arH, arM) = delta("dedup-shingle-arrays")
    assert(arM == 1 && arH >= 1,
      s"shared doc-array index must build once: hits=$arH misses=$arM")
  }

  test("curateRoute: streaming admission equals the batch keep set") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import sqlCtx.implicits._
    // the curate_pipeline query's planted corpus: raw docs + crawl-noise
    // exact copies of every 100th under shifted ids
    val raw = Tables.t(spark, sf001, "documents")
      .select(col("doc_id"), col("text"))
    val messy = raw.filter(col("doc_id") % 100 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(lit("\u0007 "), col("text"), lit("\u00a0 \u2028"))
          .as("text"))
    // plus two malformed arrivals an ingest gate must REJECT, not drop
    // silently or accept by null-propagation: null text and empty text
    val spark3 = spark
    val malformed = spark3.createDataFrame(
      spark3.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(90000001L, null),
        org.apache.spark.sql.Row(90000002L, ""))),
      raw.schema)
    val planted = raw.unionByName(messy).unionByName(malformed)
    val batchKeep = Curation.curateKeep(planted)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKeep.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft-curidx").toString
    Curation.writeCurateIndex(planted, dir)
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map[Long, (Boolean, String)]()
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        got.synchronized {
          got ++= Curation.curateRoute(b, dir).collect()
            .map(r => r.getLong(0) ->
              ((r.getBoolean(1), if (r.isNullAt(2)) "" else r.getString(2))))
        }
        ()
      }.start()
    try {
      val rows = planted.collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      val (h1, h2) = rows.splitAt(rows.length / 2)
      input.addData(h1)
      q.processAllAvailable()
      input.addData(h2)
      q.processAllAvailable()
    } finally q.stop()
    // exactly one decision per arrival; the admitted set IS the batch set
    assert(got.size == planted.count())
    val admitted = got.collect { case (id, (true, _)) => id }.toSet
    assert(admitted == batchKeep,
      s"route-only: ${(admitted -- batchKeep).take(5)}; " +
        s"batch-only: ${(batchKeep -- admitted).take(5)}")
    // reason spot checks: every planted messy copy normalizes into an
    // exact dup of its original — unless the original itself is under the
    // token floor, in which case the copy fails the floor first (reason
    // order is pipeline order); every bench-slice survivor is held out
    val shortOrigs = raw.filter(col("doc_id") % 100 === 0 &&
        Curation.tokenCount(col("text")) < 20)
      .select("doc_id").collect().map(_.getLong(0) + 10000000L).toSet
    val messyIds = got.keys.filter(id => id >= 10000000L && id < 90000000L)
    assert(messyIds.nonEmpty && messyIds.forall(id => got(id) ==
      ((false, if (shortOrigs(id)) "quality" else "exact_dup"))))
    val heldOut = got.collect { case (id, (false, "held_out")) => id }
    assert(heldOut.nonEmpty && heldOut.forall(_ % 97 == 0))
    // malformed arrivals get explicit quality rejections
    assert(got(90000001L) == ((false, "quality")), "null text must reject")
    assert(got(90000002L) == ((false, "quality")), "empty text must reject")
  }

  test("sequential ingest (decide + learn) converges to the batch keep set") {
    val spark2 = spark
    import spark2.implicits._
    def words(p: String, lo: Int, hi: Int) =
      (lo to hi).map(i => s"$p$i").mkString(" ")
    // the transitive near-dup chain a<b<c: J(a,b)=J(b,c)=17/27≈0.63 >= 0.6
    // but J(a,c)=12/32 < 0.6 — batch curation drops BOTH b and c (b stays
    // a kept1 member after its own rejection), so the online index must
    // learn every KEEPER, not just accepted docs, or c slips through
    val a = words("t", 1, 24)
    val b = words("q", 1, 5) + " " + words("t", 6, 24)
    val c = words("q", 1, 5) + " " + words("t", 6, 19) + " " + words("r", 1, 5)
    val g = words("g", 1, 24)                       // bench member (97%97=0)
    val h = words("x", 1, 18) + " " + words("g", 7, 11) // 3 shared shingles
    val all = Seq(10L -> a, 20L -> b, 30L -> c, 40L -> a, 50L -> a,
      60L -> "too short", 97L -> g, 200L -> h).toDF("doc_id", "text")
    val batchKeep = Curation.curateKeep(all)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKeep == Set(10L), s"fixture regression: $batchKeep")
    // start from an EMPTY index and ingest in arrival batches, learning
    // after each decision round — the production loop
    val dir = java.nio.file.Files.createTempDirectory("graft-seq").toString
    Curation.writeCurateIndex(all.filter(lit(false)), dir)
    val batches: Seq[Seq[(Long, String)]] = Seq(
      Seq(10L -> a, 60L -> "too short"),
      Seq(20L -> b, 40L -> a),
      Seq(30L -> c, 50L -> a),
      Seq(97L -> g),
      Seq(200L -> h))
    val got = scala.collection.mutable.Map[Long, (Boolean, String)]()
    batches.foreach { rows =>
      val bdf = rows.toDF("doc_id", "text")
      got ++= Curation.curateRoute(bdf, dir).collect()
        .map(r => r.getLong(0) ->
          ((r.getBoolean(1), if (r.isNullAt(2)) "" else r.getString(2))))
      Curation.appendCurateIndex(bdf, dir)
    }
    val admitted = got.collect { case (id, (true, _)) => id }.toSet
    assert(admitted == batchKeep,
      s"sequential admissions $admitted != batch $batchKeep")
    assert(got(20L) == ((false, "near_dup")))
    assert(got(30L) == ((false, "near_dup")),
      "the chain's c must reject against the REJECTED-but-kept b")
    assert(got(40L) == ((false, "exact_dup")) &&
      got(50L) == ((false, "exact_dup")))
    assert(got(60L) == ((false, "quality")))
    assert(got(97L) == ((false, "held_out")))
    assert(got(200L) == ((false, "contaminated")),
      "the learned bench member must screen later arrivals")
  }

  test("intra-batch self-screening: same-batch duplicates decide like the batch pipeline") {
    val spark2 = spark
    import spark2.implicits._
    def words(p: String, lo: Int, hi: Int) =
      (lo to hi).map(i => s"$p$i").mkString(" ")
    val a = words("t", 1, 24)
    val aNear = words("q", 1, 5) + " " + words("t", 6, 24) // J=17/27>=0.6
    val g = words("g", 1, 24)                              // bench (97%97=0)
    val h = words("x", 1, 18) + " " + words("g", 7, 11)    // 3 shared shingles
    // EVERY colliding pair arrives in the SAME batch, against an index
    // that contains NONE of them — the decide+learn gap ADVICE r11
    // flagged: with stored-only lookups both members of each pair would
    // be admitted
    val batch = Seq(10L -> a, 40L -> a,        // exact pair, same batch
      20L -> aNear,                            // near-dup of keeper 10
      97L -> g, 200L -> h,                     // bench + contaminated
      60L -> "too short")
    val all = batch.toDF("doc_id", "text")
    val batchKeep = Curation.curateKeep(all)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKeep == Set(10L), s"fixture regression: $batchKeep")
    val dir = java.nio.file.Files.createTempDirectory("graft-intra").toString
    Curation.writeCurateIndex(all.filter(lit(false)), dir)
    val got = Curation.curateRoute(all, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(1), if (r.isNullAt(2)) "" else r.getString(2)))).toMap
    assert(got(10L) == ((true, "")))
    assert(got(40L) == ((false, "exact_dup")),
      "same-batch exact copy must reject against the batch keeper")
    assert(got(20L) == ((false, "near_dup")),
      "same-batch near-dup must reject against the batch keeper")
    assert(got(97L) == ((false, "held_out")))
    assert(got(200L) == ((false, "contaminated")),
      "a same-batch bench keeper must screen its batch-mates")
    assert(got(60L) == ((false, "quality")))
  }

  test("the whole corpus as ONE batch from an EMPTY index equals curateKeep") {
    // the strongest intra-batch property: a single micro-batch holding
    // the entire planted corpus (every duplicate pair batch-internal,
    // nothing stored) must admit exactly the batch pipeline's keep set —
    // valid because no shingle crosses the df cut at this corpus size
    // (the route's one documented between-batch caveat)
    val raw = Tables.t(spark, sf001, "documents")
      .select(col("doc_id"), col("text"))
    val messy = raw.filter(col("doc_id") % 100 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(lit(" "), col("text"), lit("   "))
          .as("text"))
    val planted = raw.unionByName(messy)
    val batchKeep = Curation.curateKeep(planted)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKeep.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft-onebatch").toString
    Curation.writeCurateIndex(planted.filter(lit(false)), dir)
    val decisions = Curation.curateRoute(planted, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(decisions.size == planted.count())
    val admitted = decisions.collect { case (id, true) => id }.toSet
    assert(admitted == batchKeep,
      s"route-only: ${(admitted -- batchKeep).take(5)}; " +
        s"batch-only: ${(batchKeep -- admitted).take(5)}")
  }

  test("randomized corpora: per-doc sequential ingest == one-batch route == batch keep") {
    val spark2 = spark
    import spark2.implicits._
    // seeded random corpora with planted exact dups, near-dups, shorts,
    // and one early bench doc; EVERY route mode must reproduce the batch
    // pipeline's keep set exactly — the route tier has no probabilistic
    // stage left, so equality is a hard property, not an expectation.
    // (Bench docs carry the lowest id: sequential ingest can only screen
    // against already-learned bench members, the loop's documented
    // ordering contract; coincidental near-dup pairs among the random
    // docs are fine — both sides compute them identically.)
    for (seed <- Seq(11, 23)) {
      val rnd = new scala.util.Random(seed)
      val vocab = (0 until 40).map(i => s"w$i")
      def randDoc() =
        Vector.fill(22 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.size)))
      val bench = (97L, randDoc().mkString(" "))        // 97 % 97 == 0
      val bases = (0 until 6).map(i => (100L + i, randDoc()))
      // near-dup of a base: mutate 2-3 positions
      val near = {
        val (srcId, toks) = bases(rnd.nextInt(bases.size))
        val out = (1 to 2 + rnd.nextInt(2)).foldLeft(toks)((t, _) =>
          t.updated(rnd.nextInt(t.size), vocab(rnd.nextInt(vocab.size))))
        (200L, out.mkString(" "))
      }
      // contaminated: splice a 6-token run of the bench doc into noise
      val cont = (210L, (randDoc().take(12) ++
        bench._2.split(" ").slice(3, 9) ++ randDoc().take(8)).mkString(" "))
      val exact = (220L, bases(1)._2.mkString(" "))     // exact dup
      val short = (230L, "just five words right here")
      val all = (Seq(bench) ++ bases.map { case (i, t) => (i, t.mkString(" ")) }
        ++ Seq(near, cont, exact, short)).toDF("doc_id", "text")
      val batchKeep = Curation.curateKeep(all)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(!batchKeep(220L) && !batchKeep(230L) && !batchKeep(97L),
        s"seed $seed fixture: planted drops must drop, got $batchKeep")
      // (i) whole corpus as ONE batch from an empty index
      val d1 = java.nio.file.Files.createTempDirectory("graft-prop1").toString
      Curation.writeCurateIndex(all.filter(lit(false)), d1)
      val oneBatch = Curation.curateRoute(all, d1).collect()
        .collect { case r if r.getBoolean(1) => r.getLong(0) }.toSet
      assert(oneBatch == batchKeep,
        s"seed $seed one-batch: ${oneBatch} != $batchKeep")
      // (ii) strict one-at-a-time decide+learn in id order
      val d2 = java.nio.file.Files.createTempDirectory("graft-prop2").toString
      Curation.writeCurateIndex(all.filter(lit(false)), d2)
      val rows = all.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val seq = scala.collection.mutable.Set.empty[Long]
      rows.foreach { case (id, tx) =>
        val one = Seq(id -> tx).toDF("doc_id", "text")
        if (Curation.curateRoute(one, d2).head().getBoolean(1)) seq += id
        Curation.appendCurateIndex(one, d2)
      }
      assert(seq.toSet == batchKeep,
        s"seed $seed sequential: ${seq.toSet} != $batchKeep")
    }
  }

  test("compactCurateIndex squashes loop state; decisions unchanged, idempotent") {
    val spark2 = spark
    import spark2.implicits._
    def words(p: String, lo: Int, hi: Int) =
      (lo to hi).map(i => s"$p$i").mkString(" ")
    val rows = (0 until 10).map(i => (i * 10 + 1).toLong -> words(s"v$i", 1, 24))
    val all = rows.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-ccompact").toString
    Curation.writeCurateIndex(all.filter(lit(false)), dir)
    // ten single-doc learn steps — the worst-case fragmentation shape
    rows.foreach { case (id, tx) =>
      Curation.appendCurateIndex(Seq(id -> tx).toDF("doc_id", "text"), dir)
    }
    // probes: one exact dup, one near dup, one fresh
    val probes = Seq(5000L -> rows(3)._2,
      5001L -> (words("v7", 1, 20) + " " + words("z", 1, 4)),
      5002L -> words("fresh", 1, 24)).toDF("doc_id", "text")
    def decide = Curation.curateRoute(probes, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(1), if (r.isNullAt(2)) "" else r.getString(2)))).toMap
    val before = decide
    assert(before(5000L) == ((false, "exact_dup")) &&
      before(5001L) == ((false, "near_dup")) && before(5002L)._1)
    val swept = Curation.compactCurateIndex(spark, dir, maxFilesPerTable = 2)
    assert(swept.nonEmpty, "ten appends must leave compactable state")
    assert(decide == before, "compaction must not change any decision")
    assert(Curation.compactCurateIndex(spark, dir, maxFilesPerTable = 2).isEmpty,
      "idempotent second sweep")
  }

  test("a crash inside the decide+learn loop rolls back atomically; the re-run converges") {
    val spark2 = spark
    import spark2.implicits._
    def words(p: String, lo: Int, hi: Int) =
      (lo to hi).map(i => s"$p$i").mkString(" ")
    val a = words("t", 1, 24)
    val b = words("q", 1, 5) + " " + words("t", 6, 24)
    val all = Seq(10L -> a, 20L -> b, 40L -> a).toDF("doc_id", "text")
    val batchKeep = Curation.curateKeep(all)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft-crashloop").toString
    Curation.writeCurateIndex(all.filter(lit(false)), dir)
    val got = scala.collection.mutable.Map[Long, Boolean]()
    val batches = Seq(Seq(10L -> a), Seq(20L -> b, 40L -> a))
    batches.zipWithIndex.foreach { case (rows, i) =>
      val bdf = rows.toDF("doc_id", "text")
      got ++= Curation.curateRoute(bdf, dir).collect()
        .map(r => r.getLong(0) -> r.getBoolean(1))
      if (i == 0) {
        // kill the FIRST learn step twice — once mid-stage inside the
        // nested lsh append, once after the hash files moved in but
        // before the composite commit (the window where a non-atomic
        // design leaves `hashes` ahead of `lsh` and the re-run computes
        // an empty keeper batch, permanently skipping the index)
        for (point <- Seq("staged", "curate-before-commit")) {
          graft.sources.IndexCommit.failpoint =
            p => if (p == point) throw new RuntimeException(s"boom:$p")
          val thrown = try { Curation.appendCurateIndex(bdf, dir); false }
            catch { case e: RuntimeException
              if e.getMessage == s"boom:$point" => true }
            finally graft.sources.IndexCommit.failpoint = _ => ()
          assert(thrown, s"failpoint $point must fire")
        }
      }
      Curation.appendCurateIndex(bdf, dir) // the (re-)run that lands
    }
    val admitted = got.collect { case (id, true) => id }.toSet
    assert(admitted == batchKeep,
      s"crashed-and-rerun loop admitted $admitted, batch says $batchKeep")
    // the learned state is whole: doc 20 (near-dup) and 40 (exact dup)
    // must have rejected against state the crashed appends built
    assert(got(20L) == false && got(40L) == false)
  }

  test("curateRoute with a stored-LM leg: the perplexity verdict splices " +
      "in at the CCNet position and changes nothing else") {
    import graft.operators.LangModel
    val raw = Tables.t(spark, sf001, "documents")
      .select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-route-lm").toString
    Curation.writeCurateIndex(raw, dir)
    val lmDir = java.nio.file.Files
      .createTempDirectory("graft-route-lm-model").toString
    LangModel.writeLmIndex(Curation.normalizeDocs(raw)
        .select(col("doc_id"), col("norm").as("text"))
        .filter(col("doc_id") % 4 === 0), lmDir, vocabTop = 200)
    def reasons(lm: Option[String]) =
      Curation.curateRoute(raw, dir, lmDir = lm, lmThr = 36000000L)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(2)) null else r.getString(2))).toMap
    val without = reasons(None)
    val withLm = reasons(Some(lmDir))
    assert(!without.values.toSet.contains("perplexity"),
      "the default route must not plan or emit the LM stage")
    assert(withLm.values.toSet.contains("perplexity"),
      "the threshold must actually cut part of the corpus")
    // splice invariant: decisions differ ONLY where the LM fires, and it
    // may only preempt stages BELOW it (contamination / held-out / accept)
    withLm.foreach { case (id, r) =>
      if (r == "perplexity")
        assert(without(id) == null || without(id) == "contaminated" ||
          without(id) == "held_out",
          s"doc $id: perplexity may only preempt later stages, " +
            s"displaced '${without(id)}'")
      else assert(r == without(id),
        s"doc $id: non-LM decisions must be untouched " +
          s"('$r' vs '${without(id)}')")
    }
  }

  test("curateRoute composes an ORDER-3 stored LM (r16): the dispatch is " +
      "transparent and the fired set equals the standalone trigram " +
      "gate's rejections") {
    import graft.operators.LangModel
    val raw = Tables.t(spark, sf001, "documents")
      .select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-route-lm3").toString
    Curation.writeCurateIndex(raw, dir)
    val normed = Curation.normalizeDocs(raw)
      .select(col("doc_id"), col("norm").as("text"))
    val lmDir = java.nio.file.Files
      .createTempDirectory("graft-route-lm3-model").toString
    LangModel.writeLmIndex(normed.filter(col("doc_id") % 4 === 0), lmDir,
      vocabTop = 200, order = 3)
    // self-calibrating threshold: the median mean-surprise of the
    // corpus under the trained model, so the cut is real on any fixture
    val thr = LangModel.lmRoute(normed, lmDir, 0L)
      .filter(col("n_trigrams") > 0)
      .select((col("surprise_sum").cast("double") / col("n_trigrams"))
        .as("ms"))
      .stat.approxQuantile("ms", Array(0.5), 0.0)(0).toLong
    def reasons(lm: Option[String]) =
      Curation.curateRoute(raw, dir, lmDir = lm, lmThr = thr)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(2)) null else r.getString(2))).toMap
    val without = reasons(None)
    val withLm = reasons(Some(lmDir))
    // the standalone order-3 gate over the SAME normalized text the
    // route scores — the composition must fire on exactly this set
    // (minus docs an earlier stage already rejected)
    val lmCut = LangModel.lmRoute(normed, lmDir, thr)
      .filter(!col("admitted"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(withLm.values.count(_ == "perplexity") > 0,
      "the median threshold must cut part of the corpus")
    withLm.foreach { case (id, r) =>
      if (r == "perplexity") {
        assert(lmCut(id),
          s"doc $id marked perplexity but the standalone gate admits it")
        assert(without(id) == null || without(id) == "contaminated" ||
          without(id) == "held_out",
          s"doc $id: perplexity may only preempt later stages " +
            s"(displaced '${without(id)}')")
      } else {
        assert(r == without(id),
          s"doc $id: non-LM decisions must be untouched")
        if (lmCut(id))
          assert(Set("quality", "exact_dup", "near_dup")(r),
            s"doc $id is lm-cut but not marked perplexity — only an " +
              s"EARLIER stage may preempt (got '$r')")
      }
    }
  }
}

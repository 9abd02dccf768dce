package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.LangModel

/** The stored n-gram LM family ([[graft.operators.LangModel]]): exact
  * integer scoring vs a brute reference, the learn/forget/as-of loop,
  * LSM compaction + the maintain() policy driver, crash-atomic learns,
  * and the route's bucket pruning. The oracle bridge (train + serve
  * replayed by DuckDB) is q:`curate_lm_route`.
  */
class LangModelSpec extends SparkSpec {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft-lm").toString

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Driver-side reference scorer — same arithmetic, independent code
    * path (BigInt division truncates like SQL `div` for the positive
    * operands here).
    */
  private def brute(ref: Seq[String], eval: Seq[(Long, String)],
                    vocabTop: Int, thr: Long,
                    learned: Seq[String] = Nil)
      : Map[Long, (Long, BigInt, Boolean)] = {
    // the vocab trains on `ref` ONLY — `learned` slices count through the
    // FROZEN vocab, the engine's append contract
    val unis = ref.flatMap(_.split(" ", -1))
    val vocab = unis.groupBy(identity).map { case (t, g) => (t, g.size) }
      .toSeq.sortBy { case (t, c) => (-c, t) }.take(vocabTop).map(_._1).toSet
    def m(t: String) = if (vocab(t)) t else LangModel.Unk
    val refBg = (ref ++ learned).map(_.split(" ", -1)).filter(_.length >= 2)
      .flatMap(_.sliding(2).map(p => (m(p(0)), m(p(1)))))
    val bi = refBg.groupBy(identity).map { case (k, g) => (k, g.size.toLong) }
    val ctx = refBg.groupBy(_._1).map { case (k, g) => (k, g.size.toLong) }
    val v = vocab.size + 1
    eval.map { case (id, txt) =>
      val ts = txt.split(" ", -1)
      if (ts.length < 2) id -> ((0L, BigInt(0), true))
      else {
        val ss = ts.sliding(2).map { p =>
          val (w1, w2) = (m(p(0)), m(p(1)))
          BigInt(LangModel.Scale) * (ctx.getOrElse(w1, 0L) + v) /
            (bi.getOrElse((w1, w2), 0L) + 1)
        }.sum
        val n = ts.length - 1L
        id -> ((n, ss, ss <= BigInt(thr) * n))
      }
    }.toMap
  }

  private def collectRoute(batch: DataFrame, dir: String,
                           thr: Long, asOf: Option[Int] = None)
      : Map[Long, (Long, BigInt, Boolean)] =
    LangModel.lmRoute(batch, dir, thr, asOf = asOf).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1),
        BigInt(r.getDecimal(2).toBigInteger), r.getBoolean(3)))
    }.toMap

  private val refA = Seq(
    "the cat sat on the mat",
    "the cat ran on the mat",
    "a dog sat on a log",
    "the dog ran to the log")

  // eval: a fluent doc (all bigrams seen), a garbage doc (none seen), a
  // 1-token doc (no evidence -> admitted), and an OOV-heavy doc
  private val evalDocs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "zzz qqq www eee rrr ttt"),
    (3L, "single"),
    (4L, "the cat xylophone quark on the mat"))

  test("lmRoute matches the brute-force reference scorer, <unk> path " +
      "and no-evidence docs included") {
    val dir = tmp()
    // vocabTop 8 so real ref tokens fall OUT of vocab too
    LangModel.writeLmIndex(df(refA.zipWithIndex.map {
      case (t, i) => (i.toLong, t) }), dir, vocabTop = 8)
    val thr = 30000000L
    val got = collectRoute(df(evalDocs), dir, thr)
    val want = brute(refA, evalDocs, vocabTop = 8, thr)
    assert(got == want)
    assert(got(3L) == ((0L, BigInt(0), true)),
      "a doc under two tokens carries no evidence and must be admitted")
  }

  test("with the full vocabulary the threshold splits fluent from " +
      "garbage docs") {
    val dir = tmp()
    // vocabTop 50 >> ref vocab: no ref token maps to <unk>, so garbage
    // bigrams are genuinely unseen and pay the full Scale*(0+V) surprise
    LangModel.writeLmIndex(df(refA.zipWithIndex.map {
      case (t, i) => (i.toLong, t) }), dir, vocabTop = 50)
    val thr = 8000000L
    val got = collectRoute(df(evalDocs), dir, thr)
    assert(got == brute(refA, evalDocs, vocabTop = 50, thr))
    assert(got(1L)._3 && !got(2L)._3,
      "the threshold must split the fluent doc from the garbage doc")
  }

  test("learn shifts decisions, forget restores them exactly, as-of " +
      "serves the pre-learn version") {
    val dir = tmp()
    LangModel.writeLmIndex(df(refA.zipWithIndex.map {
      case (t, i) => (i.toLong, t) }), dir, vocabTop = 8)
    val thr = 30000000L
    val d0 = collectRoute(df(evalDocs), dir, thr)
    // the garbage doc's phrasing, learned as reference usage — through
    // the FROZEN vocab its tokens map to <unk>, so the (<unk>,<unk>)
    // count grows and doc 2's surprise drops
    val refB = df(Seq((100L, "zzz qqq www eee rrr ttt zzz qqq www eee")))
    assert(LangModel.appendLmCounts(refB, dir) > 0)
    val d1 = collectRoute(df(evalDocs), dir, thr)
    assert(d1 != d0, "learned counts must move at least one score")
    assert(d1(2L)._2 < d0(2L)._2,
      "the learned phrasing must lower doc 2's surprise")
    // the whole post-learn state equals the retrain-from-scratch brute
    // (vocab frozen: brute maps refB through refA's vocab the same way)
    val wantLearned = brute(refA, evalDocs, 8, thr,
      learned = Seq("zzz qqq www eee rrr ttt zzz qqq www eee"))
    assert(d1 == wantLearned,
      "append through the frozen vocab must equal a recount over " +
        "ref + learned slices")
    // as-of: version 0 still serves the pre-learn decisions
    assert(collectRoute(df(evalDocs), dir, thr, asOf = Some(0)) == d0)
    // forget the same slice: decisions return to d0 exactly
    assert(LangModel.forgetLmCounts(refB, dir) > 0)
    assert(collectRoute(df(evalDocs), dir, thr) == d0,
      "forget must erase exactly the learned contribution")
  }

  test("compaction folds the LSM without changing decisions, drops " +
      "annihilated grams, and maintain() drives it idempotently") {
    val dir = tmp()
    LangModel.writeLmIndex(df(refA.zipWithIndex.map {
      case (t, i) => (i.toLong, t) }), dir, vocabTop = 8)
    val thr = 30000000L
    val learned = df(Seq((100L, "the cat sat on the mat again and again")))
    for (_ <- 1 to 9) assert(LangModel.appendLmCounts(learned, dir) > 0)
    // one slice forgotten: its counts annihilate one append's worth
    assert(LangModel.forgetLmCounts(learned, dir) > 0)
    val before = collectRoute(df(evalDocs), dir, thr)
    val m1 = LangModel.maintainLmIndex(spark, dir)
    assert(m1.family == "lm" && m1.action == "compact" && m1.units > 8,
      s"11 segments exceed the fold budget (got $m1)")
    assert(collectRoute(df(evalDocs), dir, thr) == before,
      "the fold must not move any decision")
    val m2 = LangModel.maintainLmIndex(spark, dir)
    assert(m2.action == "noop", s"re-run must converge (got $m2)")
    // 8 appends of the slice survive; no gram row annihilated to zero
    // may remain physically
    val seg = spark.read.parquet(s"$dir/bi")
    assert(seg.filter(col("cnt") === 0L).count() == 0,
      "compaction must drop zero-count grams")
  }

  test("a learn crashed at any failpoint publishes nothing and re-runs " +
      "to exactly one delta") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmp()
    LangModel.writeLmIndex(df(refA.zipWithIndex.map {
      case (t, i) => (i.toLong, t) }), dir, vocabTop = 8)
    val refB = df(Seq((100L, "the cat sat on the mat")))
    for (point <- Seq("lm-staged", "lm-before-commit")) {
      graft.sources.IndexCommit.failpoint =
        p => if (p == point) throw new RuntimeException(s"boom:$p")
      val thrown = try { LangModel.appendLmCounts(refB, dir); false }
        catch { case e: RuntimeException
          if e.getMessage == s"boom:$point" => true }
        finally graft.sources.IndexCommit.failpoint = _ => ()
      assert(thrown, s"failpoint $point must fire")
      assert(graft.sources.IndexCommit.versionsOf(dir) == Seq(0),
        s"a learn crashed at $point must publish nothing")
    }
    assert(LangModel.appendLmCounts(refB, dir) > 0)
    // ("the","cat") is 1 in base + exactly 1 learned delta: a leaked
    // crash leftover would have made it 3
    val thr = 30000000L
    val got = collectRoute(df(Seq((1L, "the cat"))), dir, thr)
    val want = brute(refA, Seq((1L, "the cat")), 8, thr,
      learned = Seq("the cat sat on the mat"))
    assert(got == want, "the re-run must land exactly once")
  }

  test("lmOovStats: a distribution shift raises the OOV and unseen " +
      "fractions; in-domain arrivals stay covered") {
    val dir = tmp()
    LangModel.writeLmIndex(df(refA.zipWithIndex.map {
      case (t, i) => (i.toLong, t) }), dir, vocabTop = 50)
    def stats(rows: Seq[(Long, String)]) = {
      val r = LangModel.lmOovStats(df(rows), dir).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // in-domain: a ref sentence — zero OOV, zero unseen bigrams
    assert(stats(Seq((1L, "the cat sat on the mat"))) == ((6L, 0L, 5L, 0L)))
    // shifted: all-new tokens — full OOV; bigrams map to (<unk>,<unk>),
    // which the ref corpus (fully in-vocab at vocabTop=50) never saw
    assert(stats(Seq((2L, "zzz qqq www eee"))) == ((4L, 4L, 3L, 3L)))
    // mixed: known context, new tail — counts split exactly
    val (nt, no, nb2, nu) = stats(Seq((3L, "the cat zzz")))
    assert(nt == 3L && no == 1L && nb2 == 2L && nu == 1L,
      s"mixed doc must split exactly (got ($nt,$no,$nb2,$nu))")
  }

  /** Driver-side order-3 reference scorer: Stupid Backoff at α = 2/5
    * with the bigram-Laplace floor, all BigInt — the same rule
    * [[graft.operators.LangModel.surpriseTrigram]] encodes.
    */
  private def brute3(ref: Seq[String], eval: Seq[(Long, String)],
                     vocabTop: Int, thr: Long,
                     learned: Seq[String] = Nil)
      : Map[Long, (Long, BigInt, Boolean)] = {
    val unis = ref.flatMap(_.split(" ", -1))
    val vocab = unis.groupBy(identity).map { case (t, g) => (t, g.size) }
      .toSeq.sortBy { case (t, c) => (-c, t) }.take(vocabTop).map(_._1).toSet
    def m(t: String) = if (vocab(t)) t else LangModel.Unk
    val all = (ref ++ learned).map(_.split(" ", -1))
    val refBg = all.filter(_.length >= 2)
      .flatMap(_.sliding(2).map(p => (m(p(0)), m(p(1)))))
    val refTg = all.filter(_.length >= 3)
      .flatMap(_.sliding(3).map(p => (m(p(0)), m(p(1)), m(p(2)))))
    val bi = refBg.groupBy(identity).map { case (k, g) => (k, g.size.toLong) }
    val ctx = refBg.groupBy(_._1).map { case (k, g) => (k, g.size.toLong) }
    val tri = refTg.groupBy(identity).map { case (k, g) => (k, g.size.toLong) }
    val v = vocab.size + 1
    eval.map { case (id, txt) =>
      val ts = txt.split(" ", -1)
      if (ts.length < 3) id -> ((0L, BigInt(0), true))
      else {
        val ss = ts.sliding(3).map { q =>
          val (w1, w2, w3) = (m(q(0)), m(q(1)), m(q(2)))
          val c123: Long = tri.getOrElse((w1, w2, w3), 0L)
          val c12: Long = bi.getOrElse((w1, w2), 0L)
          val c23: Long = bi.getOrElse((w2, w3), 0L)
          val c2: Long = ctx.getOrElse(w2, 0L)
          if (c123 > 0)
            BigInt(LangModel.Scale) * c12 / c123
          else
            BigInt(LangModel.BackoffNum * LangModel.Scale) * (c2 + v) /
              (LangModel.BackoffDen * (c23 + 1))
        }.sum
        val n = ts.length - 2L
        id -> ((n, ss, ss <= BigInt(thr) * n))
      }
    }.toMap
  }

  // order-3 eval: a fluent doc (trigram hits), a doc that forces the
  // BACKOFF path (a seen bigram inside an unseen trigram context), full
  // garbage, a 2-token doc (no trigram evidence -> admitted), OOV mix
  private val eval3 = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "a dog sat on the mat"),
    (3L, "zzz qqq www eee rrr ttt"),
    (4L, "the cat"),
    (5L, "the cat xylophone quark on the mat"))

  test("order-3 lmRoute matches the Stupid-Backoff brute scorer — " +
      "trigram hits, backoff path, <unk>, and no-evidence docs") {
    val dir = tmp()
    LangModel.writeLmIndex(df(refA.zipWithIndex.map {
      case (t, i) => (i.toLong, t) }), dir, vocabTop = 50, order = 3)
    val thr = 8000000L
    val got = collectRoute(df(eval3), dir, thr)
    val want = brute3(refA, eval3, vocabTop = 50, thr)
    assert(got == want)
    assert(got(4L) == ((0L, BigInt(0), true)),
      "a doc under three tokens carries no trigram evidence")
    // doc 2's first trigram ("a dog sat") is unseen but its backoff
    // bigram ("dog sat") is stored: the surprise must be the backed-off
    // bigram score, not the unseen floor doc 3 pays
    assert(got(2L)._2 < got(3L)._2,
      "the backoff path must discriminate seen-bigram docs from garbage")
    assert(got(1L)._3 && !got(3L)._3,
      "the threshold must split fluent from garbage at order 3")
    // vocab shrink: <unk> mapping flows through all three positions
    val dir2 = tmp()
    LangModel.writeLmIndex(df(refA.zipWithIndex.map {
      case (t, i) => (i.toLong, t) }), dir2, vocabTop = 8, order = 3)
    assert(collectRoute(df(eval3), dir2, thr) ==
      brute3(refA, eval3, vocabTop = 8, thr))
  }

  test("order-3 learn/forget move BOTH count tables atomically; as-of " +
      "and compaction preserve decisions") {
    val dir = tmp()
    LangModel.writeLmIndex(df(refA.zipWithIndex.map {
      case (t, i) => (i.toLong, t) }), dir, vocabTop = 50, order = 3)
    val thr = 8000000L
    val d0 = collectRoute(df(eval3), dir, thr)
    val slice = "a dog sat on the mat again then again"
    assert(LangModel.appendLmCounts(df(Seq((100L, slice))), dir) > 0)
    val d1 = collectRoute(df(eval3), dir, thr)
    assert(d1 != d0 && d1(2L)._2 < d0(2L)._2,
      "learning doc 2's phrasing must lower its surprise")
    assert(d1 == brute3(refA, eval3, 50, thr, learned = Seq(slice)),
      "post-learn state must equal a retrain over ref + learned")
    assert(collectRoute(df(eval3), dir, thr, asOf = Some(0)) == d0)
    assert(LangModel.forgetLmCounts(df(Seq((100L, slice))), dir) > 0)
    assert(collectRoute(df(eval3), dir, thr) == d0,
      "forget must erase the learned trigrams AND bigrams exactly")
    // fragment, then fold: decisions unchanged, tri zero-rows dropped
    for (_ <- 1 to 9)
      LangModel.appendLmCounts(df(Seq((101L, slice))), dir)
    LangModel.forgetLmCounts(df(Seq((101L, slice))), dir)
    val before = collectRoute(df(eval3), dir, thr)
    val m1 = LangModel.maintainLmIndex(spark, dir)
    assert(m1.action == "compact")
    assert(collectRoute(df(eval3), dir, thr) == before,
      "the fold must not move any order-3 decision")
    assert(spark.read.parquet(s"$dir/tri")
      .filter(col("cnt") === 0L).count() == 0,
      "compaction must drop zero-count trigrams too")
  }

  test("surpriseBigram stays exact past Long.MaxValue/Scale context " +
      "counts — the decimal(38,0) contract (ADVICE r15)") {
    val spark2 = spark
    import spark2.implicits._
    // ctx > ~9.2e12 is where the old long product (Scale * (ctx+V))
    // wrapped; probe well past it, plus a divisor > 2e6 (where a rounded
    // decimal `/` + floor could misround) and the boundary cases
    val v = 1001L
    val cases = Seq(
      (5000000000000000L, 2L),          // 5e15: long product wraps
      (9223372036854L, 0L),             // just past Long.MaxValue/Scale
      (9223372036854775L, 999999L),     // huge ctx, big divisor
      (123456789L, 3456789L),           // divisor > 2e6: rounding regime
      (0L, 0L), (1L, 1L))               // floors
    val got = cases.toDF("ctx", "cnt")
      .select(graft.operators.LangModel.surpriseBigram(
        col("ctx"), col("cnt"), v).as("s"))
      .collect().map(r => BigInt(r.getDecimal(0).toBigInteger)).toSeq
    val want = cases.map { case (ctx, cnt) =>
      BigInt(graft.operators.LangModel.Scale) * (BigInt(ctx) + v) /
        (BigInt(cnt) + 1)
    }
    assert(got == want,
      s"decimal surprise must match BigInt exactly (got $got want $want)")
  }

  test("lmOovStats is identity-free: a batch whose first column is the " +
      "text works unchanged") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmp()
    LangModel.writeLmIndex(df(refA.zipWithIndex.map {
      case (t, i) => (i.toLong, t) }), dir, vocabTop = 50)
    // text FIRST, no id column at all — the r15 head-column guess would
    // have cast the text to a null long and dropped every bigram
    val batch = Seq(Tuple1("the cat sat on the mat")).toDF("text")
    val r = LangModel.lmOovStats(batch, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((6L, 0L, 5L, 0L)),
      "an in-domain text-only batch must count all bigrams as seen")
  }

  test("the route's bi scan prunes to the batch's probed wb buckets") {
    val dir = tmp()
    LangModel.writeLmIndex(df(refA.zipWithIndex.map {
      case (t, i) => (i.toLong, t) }), dir, vocabTop = 8)
    val plan = LangModel.lmRoute(df(Seq((1L, "the cat"))), dir, 30000000L)
      .queryExecution.executedPlan.toString
    val biScan = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("/bi"))
      .mkString("\n")
    assert(biScan.nonEmpty, s"route must scan the bi LSM:\n$plan")
    assert(biScan.contains("PartitionFilters: [") &&
      ".*PartitionFilters: \\[[^\\]]*wb.*".r.findFirstIn(biScan).isDefined,
      s"bi scan must carry wb partition filters:\n$biScan")
  }
}

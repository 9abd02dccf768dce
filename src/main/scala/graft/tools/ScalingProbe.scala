package graft.tools

import org.apache.spark.sql.SparkSession

/** Empirical scaling-exponent probe (VERDICT r7 item #7): time each named
  * query at TWO scale factors in one JVM and report the per-query growth
  * exponent, so SURVEY §9's "linear in rows" extrapolation claims are
  * measured instead of asserted.
  *
  * Method: `passes` timed runs per (query, sf) after one untimed warm-up
  * at each sf (JIT + page cache + Caches fixtures — the steady state §9
  * reasons about); the WARM-MIN is the comparable number, same discipline
  * as the bench record. Exponent = log(tBig/tSmall) / log(rowRatio) with
  * rowRatio = 10 between sf0.01 and sf0.1: 1.0 = linear, 0 = constant
  * (driver/planning floor dominates), >1 = super-linear — the flag §9
  * claims never fires.
  *
  * Usage:
  *   ScalingProbe <outFile> [name ...]                — explicit set
  *   ScalingProbe <outFile> --from-bench <record> [minWarmSec]
  *     — every query whose warm-min (min across the record's passes)
  *       exceeds minWarmSec (default 0.5 s), so the measured set tracks
  *       the expensive tail mechanically instead of a hand-kept list
  *       (VERDICT r8 item #6).
  * Default (no names): the r8 headline set.
  */
object ScalingProbe {

  /** Task input bytes/records read, summed across completed stages — the
    * bytes-per-decision axis (VERDICT r13 #1): the pruned BM25 tier's
    * value claim is per-decision I/O, which page-cached local wall time
    * cannot see. Same async-drain discipline as Bench.ShuffleByGroup.
    * Persisted arrival batches read from the block manager, NOT through
    * input metrics, so after the warm pass a metered run counts index
    * table bytes (postings/termdf/doclens/fwd + footers), which is
    * exactly the serving-read claim.
    */
  private final class InputBytes
      extends org.apache.spark.scheduler.SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val records = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      bytes.addAndGet(m.inputMetrics.bytesRead)
      records.addAndGet(m.inputMetrics.recordsRead)
    }
    private def total: Long = bytes.get + records.get
    def drain(): Unit = {
      var last = -1L; var t = total; var waited = 0
      while (t != last && waited < 2000) {
        last = t; Thread.sleep(100); waited += 100; t = total
      }
    }
    /** (bytesRead, recordsRead) attributable to one run. */
    def measure(run: () => Unit): (Long, Long) = {
      drain()
      val b0 = bytes.get; val r0 = records.get
      run()
      drain()
      (bytes.get - b0, records.get - r0)
    }
  }

  private val defaultSet = Seq(
    "curate_substring_dedup", "pipe_codec_roundtrip", "q_pagerank",
    "dedup_clusters_star", "q_equidepth", "dedup_minhash_lsh",
    "text_contaminate", "dedup_corpus", "q_pit_join", "sim_ann_lsh",
    "dedup_fuzzy", "q3_top_revenue")

  /** Warm-min per query from a full bench record: min across every
    * "queries"/"queries2"/... pass map. Plain string scanning — the
    * record is this repo's own single-line JSON, and the tools directory
    * stays dependency-free.
    */
  private[tools] def warmMinsFromBench(path: String): Map[String, Double] = {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    val passMap = """"queries\d*":\s*\{([^}]*)\}""".r
    val entry = """"([^"]+)":\s*([0-9.]+)""".r
    passMap.findAllMatchIn(txt).flatMap(m =>
        entry.findAllMatchIn(m.group(1)).map(e =>
          e.group(1) -> e.group(2).toDouble))
      .toSeq.groupMapReduce(_._1)(_._2)(math.min)
  }

  def main(args0: Array[String]): Unit = {
    // --route adds the ROUTE-TIER index-size axis (VERDICT r11 #7): the
    // standing-index claim is "route cost independent of index size" —
    // measure decisions/s for a FIXED arrival batch against indexes
    // built at both scale factors and report the growth exponent.
    val withRoute = args0.contains("--route")
    // --forget adds the FORGET-TIER axis: fixed-size tombstone deletes
    // against standing indexes built at both scale factors (the
    // O(delete set) claim — exponent near 0 across the 10x index step)
    // plus the served-path overhead tombstones add (pair search and ANN
    // route timed clean vs tombstoned on the same index).
    val withForget = args0.contains("--forget")
    val args = args0.filterNot(a => a == "--route" || a == "--forget")
    val out = args.headOption.getOrElse("SCALING_r09.json")
    val names =
      if (args.length > 2 && args(1) == "--from-bench") {
        val thresh = if (args.length > 3) args(3).toDouble else 0.5
        val wm = warmMinsFromBench(args(2))
        val picked = wm.filter(_._2 > thresh).keys.toSeq.sorted
        System.err.println(
          s"[scaling] ${picked.size} queries with warm-min > $thresh s: " +
            picked.mkString(", "))
        picked
      }
      else if (args.length > 1) args.drop(1).toSeq
      else if (withRoute || withForget) Seq.empty
      else defaultSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_SCALING_PASSES", "3").toInt
    val sfSmall = sys.env.getOrElse("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.01")
    val sfBig = sys.env.getOrElse("SPARK_GRAFT_SF_BIG", "/root/testdata/sf0.1")
    val rowRatio = sys.env.getOrElse("SPARK_GRAFT_SF_RATIO", "10.0").toDouble
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def warmMin(name: String, dir: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      fn(spark, dir).count() // untimed warm-up: JIT, caches, staged fixtures
      (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    def r3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // all small-sf runs first, then all big: Caches fixtures are keyed on
    // sfDir with one live entry per family, so interleaving would rebuild
    // them per query — this order pays each build once per sf
    val small = names.map(n => n -> warmMin(n, sfSmall)).toMap
    val big = names.map(n => n -> warmMin(n, sfBig)).toMap
    val entries = names.map { n =>
      val e = math.log(big(n) / small(n)) / math.log(rowRatio)
      s""""$n":{"t_small":${r3(small(n))},"t_big":${r3(big(n))},"exponent":${r3(e)}}"""
    }
    val flagged = names.filter(n =>
      math.log(big(n) / small(n)) / math.log(rowRatio) > 1.1)

    /** Least-squares slope of log(t) vs log(n) over the axis points —
      * the 3-point generalization of log(t2/t1)/log(n2/n1).
      */
    def fitExponent(pts: Seq[(Long, Double)]): Double = {
      val xs = pts.map(p => math.log(p._1.toDouble))
      val ys = pts.map(p => math.log(p._2))
      val xm = xs.sum / xs.size
      val ym = ys.sum / ys.size
      xs.zip(ys).map { case (x, y) => (x - xm) * (y - ym) }.sum /
        xs.map(x => (x - xm) * (x - xm)).sum
    }

    /** The scaling decades for the index-size axes (VERDICT r12 #5): the
      * driver testdata stops at sf0.1 (5k docs / 2k vectors), so the
      * third decade comes from the SAME generators as the first two —
      * all three index corpora are [[SynthFixtures]] shapes (Zipf(1.1)
      * 50k-word vocabulary documents, clustered embeddings), replacing
      * the r12 testdata corpora whose 31-word vocabulary made every
      * retrieval query a near-full-corpus disjunction (VERDICT r12 #1;
      * FIXTURES.md documents the degeneracy).
      */
    // r14: a FOURTH point (500k docs / 200k vectors) pins the flagship
    // route exponents across three decades — a 3-point fit cannot see
    // curvature. SPARK_GRAFT_AXIS_DECADES=3 trims back for quick runs.
    val axisSizes: Seq[(Long, Long)] =
      Seq((500L, 500L), (5000L, 2000L), (50000L, 20000L),
        (500000L, 200000L))
        .take(sys.env.getOrElse("SPARK_GRAFT_AXIS_DECADES", "4").toInt)

    def wm(run: () => Unit): Double = {
      run()
      (1 to passes).map { _ =>
        val t0 = System.nanoTime(); run()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    def axisJson(tag: String, tiers: Seq[String],
                 pts: Map[String, Seq[(Long, Double, Long)]],
                 recalls: Map[String, Map[Long, Double]] = Map.empty)
        : String =
      tiers.map { n =>
        val ps = pts(n)
        val e = fitExponent(ps.map(p => (p._1, p._2)))
        val ptJson = ps.map { case (sz, t, bn) =>
          val rc = recalls.get(n).flatMap(_.get(sz))
            .map(r => s""","recall":${r3(r)}""").getOrElse("")
          s"""{"n":$sz,"t":${r3(t)},"dps":${r3(bn / t)}$rc}"""
        }.mkString("[", ",", "]")
        System.err.println(s"[scaling] $tag $n: " +
          ps.map(p => s"${r3(p._3 / p._2)}@${p._1}").mkString(" -> ") +
          s" decisions/s (exponent ${r3(e)})")
        s""""$n":{"points":$ptJson,"exponent":${r3(e)}}"""
      }.mkString(s""","$tag":{""", ",", "}")

    /** Route-tier axis: warm-min seconds to decide a FIXED synthetic
      * arrival batch against standing indexes built at three sizes a
      * decade apart — curateRoute (the full admission gate), annRoute
      * (stored IVF top-k under the AutoCells sqrt(N) policy), and
      * bm25Route (term-bucket-pruned retrieval over the Zipf corpus).
      * Exponent near 0 = decision cost independent of index scale; the
      * honest residual for bm25 is candidate volume: exact disjunctive
      * top-k scores every posting of the query's terms, and a fixed
      * term's df grows with the corpus — the Zipf fixture makes that a
      * ~1% tail instead of the old fixture's 77%-per-term head.
      * bm25p_route (r13) is the certificate-driven pruned serve over
      * the SAME index + queries: per batch only the essential (rare)
      * terms' posting lists are scanned, so its slope shows how much of
      * the full route's df-growth MaxScore-style skipping removes.
      */
    def routeAxis(): String = {
      import org.apache.spark.sql.functions._
      val meter = new InputBytes
      spark.sparkContext.addSparkListener(meter)
      val batchN = sys.env.getOrElse("SPARK_GRAFT_ROUTE_BATCH", "20000").toInt
      val qBatchN = math.max(1, batchN / 10)
      // fixed arrival batches, fresh ids, same generators as the corpora
      val docBatch = SynthFixtures.zipfDocs(spark, batchN.toLong, seed = 99L)
        .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
        .persist()
      val embBatch = SynthFixtures
        .clusteredEmbeddings(spark, batchN.toLong, seed = 99L)
        .select((col("vec_id") + 1000000000L).as("vec_id"), col("embedding"))
        .persist()
      val qBatch = SynthFixtures.zipfQueries(spark, qBatchN.toLong).persist()
      // hybrid arrivals (r18): the same retrieval queries, each carrying
      // a clustered example embedding — the hybridwf tier's batch
      val qhBatch = qBatch.withColumn("embedding",
        SynthFixtures.clusteredEmbedding(col("qid"))).persist()
      docBatch.count(); embBatch.count(); qBatch.count(); qhBatch.count()
      def bench(nDocs: Long, nVecs: Long)
          : (Map[String, Double], Map[String, Long], Map[String, Double]) = {
        val docs = spark.read
          .parquet(SynthFixtures.ensureZipfDocs(spark, nDocs))
        val emb = spark.read
          .parquet(SynthFixtures.ensureEmbeddings(spark, nVecs))
        val dir = java.nio.file.Files
          .createTempDirectory("graft-route-scale").toString
        graft.operators.Curation.writeCurateIndex(docs, dir)
        graft.operators.Similarity.ivfWriteIndex(emb, s"$dir-ivf",
          nCells = graft.operators.Similarity.AutoCells)
        // frozen-cell CONTROL for the AutoCells policy: same corpus, same
        // probes, nCells pinned at the r12 default — per-decision
        // candidates grow ~linearly here vs ~sqrt(N) under the policy
        // (the exact-IVF optimum is c = sqrt(nprobe*N), per-probe cost
        // 2*sqrt(nprobe*N): a FLAT per-decision cost is impossible for
        // exhaustive cell scoring, so the policy's target slope is 0.5
        // in candidates, not 0). The control stops at the 50k decade: its
        // BY-DESIGN linear candidate volume reaches 2.5e9 rows (a ~60 GB
        // (qid, nid, cos) shuffle PER PASS) at 200k vectors — the r14
        // fourth decade measures the tiers, not the diagnostic, and the
        // contrast is established on the three shared points
        val withControl = nVecs <= 50000
        if (withControl)
          graft.operators.Similarity.ivfWriteIndex(emb, s"$dir-ivf8",
            nCells = 8)
        // r14: the compressed tier — PQ-enabled index in its OWN dir so
        // the ann_route tiers' files stay bit-comparable to r13
        graft.operators.Similarity.ivfWriteIndex(emb, s"$dir-ivfpq",
          nCells = graft.operators.Similarity.AutoCells, pqM = 16, pqK = 16)
        // forward = true: the bm25p_route tier serves the pruned path
        // from the same index; impactBlocks: the bm25w_route tier's
        // stored head blocks (r15); the full bm25_route read path is
        // unchanged by either extra table
        graft.operators.TextIndex.writeBm25Index(docs, s"$dir-bm25",
          nBuckets = 64, forward = true, impactBlocks = 4)
        // r17: the RECALL-BOUNDED df-proportional impact layout, built
        // over the LENGTH-VARIED Zipf corpus — the constant-length
        // zipfDocs makes every tf=1 posting of a term an impact TIE, so
        // no head ordering carries recall signal there (the r17 measured
        // plateau at SynthFixtures.zipfDocsVar); the throughput tiers
        // above keep the r13 corpus for cross-round comparability
        val vdocs = spark.read
          .parquet(SynthFixtures.ensureZipfDocsVar(spark, nDocs))
        graft.operators.TextIndex.writeBm25Index(vdocs, s"$dir-bm25f",
          nBuckets = 64, impactFraction = 0.2)
        // the stored-LM gate (r15 continued): trained on the same corpus,
        // decisions against the committed bigram-count LSM
        graft.operators.LangModel.writeLmIndex(docs, s"$dir-lm")
        val runs: Seq[(String, () => Unit)] = Seq(
          "lm_route" -> (() =>
            { graft.operators.LangModel.lmRoute(docBatch, s"$dir-lm",
              thrMean = 35000000L).count(); () }),
          "curate_route" -> (() =>
            { graft.operators.Curation.curateRoute(docBatch, dir).count(); () })) ++
          (if (withControl) Seq(
            "ann_route_fixed8" -> (() =>
              { graft.operators.Similarity.annRoute(embBatch, s"$dir-ivf8",
                k = 5).count(); () })) else Nil) ++ Seq(
          "ann_route" -> (() =>
            { graft.operators.Similarity.annRoute(embBatch, s"$dir-ivf",
              k = 5).count(); () }),
          "ivfpq_route" -> (() =>
            { graft.operators.Similarity.pqRoute(embBatch, s"$dir-ivfpq",
              k = 5, nprobe = 5, rerank = 8).count(); () }),
          // the PINNED-recall compressed config (r18): BOTH knobs serve
          // fractions — probeFraction pins the probed cells, and
          // rerankFraction scales the exact-rerank window with the
          // fraction-grown ADC pool (the fixed rerank*k window was the
          // r17 residual: recall 0.589 at 200k). The fixed-knob tier
          // above stays as the decay control
          "ivfpqf_route" -> (() =>
            { graft.operators.Similarity.pqRoute(embBatch, s"$dir-ivfpq",
              k = 5, nprobe = 5, rerank = 8, probeFraction = 0.1,
              rerankFraction = 0.1).count(); () }),
          "bm25_route" -> (() =>
            { graft.operators.TextIndex.bm25Route(qBatch, s"$dir-bm25",
              k = 10).count(); () }),
          "bm25p_route" -> (() =>
            { graft.operators.TextIndex.bm25RoutePruned(qBatch,
              s"$dir-bm25", k = 10).count(); () }),
          // the impact-ordered APPROXIMATE tier (r15): per query term
          // only the budget head blocks are read — the claim under test
          // is a route exponent BELOW the exact tiers' df-growth floor
          "bm25w_route" -> (() =>
            { graft.operators.TextIndex.bm25RouteWand(qBatch,
              s"$dir-bm25", k = 10, budget = 2).count(); () }),
          // the RECALL-BOUNDED fraction layout (r17): the whole stored
          // df-proportional head serves — flat recall by construction,
          // fraction-of-exact bytes
          "bm25wf_route" -> (() =>
            { graft.operators.TextIndex.bm25RouteWand(qBatch,
              s"$dir-bm25f", k = 10).count(); () }),
          // the DOUBLY-FRACTIONAL hybrid (r18, VERDICT r17 #5): lexical
          // leg = the df-proportional wand head, vector leg =
          // probeFraction IVF — both approximate legs serve fractions,
          // so the fused ranking's recall is pinned at any corpus size
          // (the recall column below measures it vs the doubly-exact
          // fusion)
          "hybridwf_route" -> (() =>
            { graft.operators.TextIndex.hybridRoute(qhBatch,
              s"$dir-bm25f", s"$dir-ivf", k = 10, wandBudget = 1,
              probeFraction = 0.1).count(); () }))
        // wm warms once untimed, so the metered pass after it reads the
        // arrival batches from cache — the byte delta is the index read
        val times = runs.map { case (n, f) => n -> wm(f) }.toMap
        val bytesRead = runs.map { case (n, f) =>
          n -> meter.measure(f)._1 }.toMap
        // Recall@k vs an EXACT ground truth AT THIS INDEX SIZE, per
        // approximate tier (VERDICT r15 #4 for text; r16 ask #2 for
        // vectors — spec-fixture floors don't transfer, so every
        // approximate tier's recall is measured at the served scale):
        import org.apache.spark.sql.DataFrame
        def recallVs(exact: DataFrame, got: DataFrame): Double = {
          val ex = exact.persist()
          val nEx = ex.groupBy("qid").agg(count(lit(1)).as("n_ex"))
          val nHit = ex.join(got, Seq("qid", "id"), "left_semi")
            .groupBy("qid").agg(count(lit(1)).as("n_hit"))
          val r = nEx.join(nHit, Seq("qid"), "left")
            .agg(avg(coalesce(col("n_hit"), lit(0L)).cast("double") /
              col("n_ex"))).collect()(0).getDouble(0)
          ex.unpersist(); r
        }
        def docIds(df: DataFrame): DataFrame =
          df.select(col("qid"), col("doc_id").as("id"))
        def nbIds(df: DataFrame): DataFrame =
          df.select(col("qid"), col("nid").as("id"))
        val rcW = recallVs(
          docIds(graft.operators.TextIndex.bm25Route(qBatch,
            s"$dir-bm25", k = 10)),
          docIds(graft.operators.TextIndex.bm25RouteWand(qBatch,
            s"$dir-bm25", k = 10, budget = 2)))
        val rcWf = recallVs(
          docIds(graft.operators.TextIndex.bm25Route(qBatch,
            s"$dir-bm25f", k = 10)),
          docIds(graft.operators.TextIndex.bm25RouteWand(qBatch,
            s"$dir-bm25f", k = 10)))
        // ANN ground truth: exhaustive-probe IVF (provably exact — the
        // sim_ivfpq adjudication shape) on a 500-probe subsample; the
        // full 20k batch would make the exact pass the axis bottleneck
        // without changing the estimate
        val probeSub = embBatch.limit(500).persist(); probeSub.count()
        val exAnn = nbIds(graft.operators.Similarity.annRoute(probeSub,
          s"$dir-ivf", k = 5, nprobe = 1 << 20)).persist()
        exAnn.count()
        val rcAnn = recallVs(exAnn,
          nbIds(graft.operators.Similarity.annRoute(probeSub, s"$dir-ivf",
            k = 5)))
        val rcPq = recallVs(exAnn,
          nbIds(graft.operators.Similarity.pqRoute(probeSub, s"$dir-ivfpq",
            k = 5, nprobe = 5, rerank = 8)))
        // r18: the pinned compressed config — both knobs fractional; the
        // fixed-knob rcPq above is the decay control
        val rcPqF = recallVs(exAnn,
          nbIds(graft.operators.Similarity.pqRoute(probeSub, s"$dir-ivfpq",
            k = 5, nprobe = 5, rerank = 8, probeFraction = 0.1,
            rerankFraction = 0.1)))
        exAnn.unpersist(); probeSub.unpersist()
        // r18 (VERDICT r17 #5): fused-ranking recall of the
        // doubly-fractional hybrid vs the doubly-EXACT fusion (exact
        // lexical leg + exhaustive-probe vector leg over the SAME
        // fraction-layout index dir — the ground truth isolates BOTH
        // approximations at once), on the ann-ground-truth-sized query
        // subsample: the exact vector leg is a brute-force scan
        val qhSub = qhBatch.limit(500).persist(); qhSub.count()
        val exHyb = docIds(graft.operators.TextIndex.hybridRoute(qhSub,
          s"$dir-bm25f", s"$dir-ivf", k = 10, wandBudget = 0,
          nprobe = 1 << 20)).persist()
        exHyb.count()
        val rcHybWf = recallVs(exHyb,
          docIds(graft.operators.TextIndex.hybridRoute(qhSub,
            s"$dir-bm25f", s"$dir-ivf", k = 10, wandBudget = 1,
            probeFraction = 0.1)))
        exHyb.unpersist(); qhSub.unpersist()
        val recall = Map("bm25w_route" -> rcW, "bm25wf_route" -> rcWf,
          "ann_route" -> rcAnn, "ivfpq_route" -> rcPq,
          "ivfpqf_route" -> rcPqF, "hybridwf_route" -> rcHybWf)
        System.err.println(
          f"[scaling] recall vs exact at $nDocs docs / $nVecs vecs: " +
            f"bm25w $rcW%.3f bm25wf $rcWf%.3f ann $rcAnn%.3f " +
            f"ivfpq $rcPq%.3f ivfpqf $rcPqF%.3f hybridwf $rcHybWf%.3f")
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$dir-ivf"))
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$dir-ivf8"))
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$dir-ivfpq"))
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$dir-bm25"))
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$dir-bm25f"))
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$dir-lm"))
        (times, bytesRead, recall)
      }
      val rs = axisSizes.map { case (nd, nv) =>
        val (t, b, rc) = bench(nd, nv); (nd, nv, t, b, rc) }
      docBatch.unpersist(); embBatch.unpersist(); qBatch.unpersist()
      qhBatch.unpersist()
      def sizeOf(tier: String, nd: Long, nv: Long): Long =
        if (tier.startsWith("ann") || tier.startsWith("ivfpq")) nv else nd
      def decided(tier: String): Long =
        if (tier.startsWith("bm25") || tier.startsWith("hybrid"))
          qBatchN.toLong
        else batchN.toLong
      // the fixed8 control has fewer points than the tiers — fit each
      // series over the sizes it actually ran
      val tiers = rs.head._3.keys.toSeq.sorted
      val pts = tiers.map { tier =>
        tier -> rs.collect { case (nd, nv, t, _, _) if t.contains(tier) =>
          (sizeOf(tier, nd, nv), t(tier), decided(tier)) }
      }.toMap
      val recalls = rs.head._5.keys.map { tier =>
        tier -> rs.map { case (nd, nv, _, _, rc) =>
          sizeOf(tier, nd, nv) -> rc(tier) }.toMap
      }.toMap
      // bytes-per-decision axis (VERDICT r13 #1): one metered pass per
      // (tier, size) — exponent fits log bytes vs log corpus size, the
      // number the pruned tier's "skipped posting lists are never read"
      // claim lives or dies by
      val byteJson = tiers.map { tier =>
        val ps = rs.collect { case (nd, nv, _, b, _) if b.contains(tier) =>
          (sizeOf(tier, nd, nv), b(tier)) }
        val e = fitExponent(ps.map(p => (p._1, math.max(1L, p._2).toDouble)))
        System.err.println(s"[scaling] route_bytes $tier: " +
          ps.map(p => s"${p._2 / decided(tier)}B@${p._1}").mkString(" -> ") +
          s" bytes/decision (exponent ${r3(e)})")
        val ptJson = ps.map { case (sz, by) =>
          s"""{"n":$sz,"bytes":$by,"bpd":${by / decided(tier)}}"""
        }.mkString("[", ",", "]")
        s""""$tier":{"points":$ptJson,"exponent":${r3(e)}}"""
      }.mkString(""","route_bytes":{""", ",", "}")
      axisJson("route", tiers, pts, recalls) + byteJson
    }
    /** Forget-tier axis: on standing LSH + IVF + BM25 indexes built at
      * three sizes a decade apart (same [[SynthFixtures]] corpora as the
      * route axis), time (a) a FIXED-size tombstone delete — disjoint id
      * slices per pass, so every pass does identical work against a
      * monotonically (slightly) more tombstoned index — and (b) the
      * served paths (stored-pair search, ANN route over a fixed probe
      * batch) before and after the deletes, isolating the broadcast
      * anti-join overhead the tombstones add. The scale claim: delete
      * cost tracks the DELETE SET (exponent near 0 across the decades,
      * modulo the LSH delete's partition-pruned occupancy correction),
      * and the serving overhead is a bounded ratio, not a function of
      * index size.
      */
    def forgetAxis(): String = {
      import org.apache.spark.sql.functions._
      val nDead = sys.env.getOrElse("SPARK_GRAFT_FORGET_N", "10").toInt
      def bench(nDocs: Long, nVecs: Long): Map[String, Double] = {
        val dir = java.nio.file.Files
          .createTempDirectory("graft-forget-scale").toString
        val docs = spark.read
          .parquet(SynthFixtures.ensureZipfDocs(spark, nDocs))
        val emb = spark.read
          .parquet(SynthFixtures.ensureEmbeddings(spark, nVecs))
        graft.operators.Dedup.writeLshIndex(docs, dir)
        graft.operators.Similarity.ivfWriteIndex(emb, s"$dir-ivf")
        graft.operators.TextIndex.writeBm25Index(docs, s"$dir-bm25")
        val probes = emb.limit(200).persist(); probes.count()
        def bm25Serve(): Unit = {
          graft.operators.TextIndex.bm25TopK(spark, s"$dir-bm25",
            Seq("spark", "merge", "vector")).count(); ()
        }
        val pairsClean = wm(() =>
          { graft.operators.Dedup.pairsFromIndex(spark, dir).count(); () })
        val annClean = wm(() =>
          { graft.operators.Similarity.annRoute(probes, s"$dir-ivf",
            k = 5).count(); () })
        val bm25Clean = wm(() => bm25Serve())
        // wm runs once untimed + `passes` timed -> passes+1 slices each
        val docIds = docs.select("doc_id").orderBy("doc_id")
          .limit(nDead * (passes + 1)).collect().map(_.getLong(0))
        val vecIds = emb.select("vec_id").orderBy("vec_id")
          .limit(nDead * (passes + 1)).collect().map(_.getLong(0))
        val spark2 = spark
        import spark2.implicits._
        var dSlice = 0
        def delDoc(): Unit = {
          val s = docIds.slice(dSlice * nDead, (dSlice + 1) * nDead)
          dSlice += 1
          graft.operators.Dedup.deleteFromLshIndex(
            s.toSeq.toDF("doc_id"), dir); ()
        }
        var vSlice = 0
        def delVec(): Unit = {
          val s = vecIds.slice(vSlice * nDead, (vSlice + 1) * nDead)
          vSlice += 1
          graft.operators.Similarity.deleteFromIvfIndex(
            s.toSeq.toDF("vec_id"), s"$dir-ivf"); ()
        }
        var bSlice = 0
        def delBm25(): Unit = {
          val s = docIds.slice(bSlice * nDead, (bSlice + 1) * nDead)
          bSlice += 1
          graft.operators.TextIndex.deleteFromBm25Index(
            s.toSeq.toDF("doc_id"), s"$dir-bm25"); ()
        }
        val tDelLsh = wm(() => delDoc())
        val tDelIvf = wm(() => delVec())
        val tDelBm25 = wm(() => delBm25())
        val pairsTomb = wm(() =>
          { graft.operators.Dedup.pairsFromIndex(spark, dir).count(); () })
        val annTomb = wm(() =>
          { graft.operators.Similarity.annRoute(probes, s"$dir-ivf",
            k = 5).count(); () })
        val bm25Tomb = wm(() => bm25Serve())
        // compaction folds the tombstones + delta segments: serving
        // returns to the clean-index shape (the anti-join leaves the plan)
        graft.operators.Dedup.compactLshIndex(spark, dir,
          maxFilesPerRange = 1)
        graft.operators.Similarity.compactIvfIndex(spark, s"$dir-ivf",
          maxFilesPerCell = 1)
        graft.operators.TextIndex.compactBm25Index(spark, s"$dir-bm25",
          maxFiles = 1)
        val pairsComp = wm(() =>
          { graft.operators.Dedup.pairsFromIndex(spark, dir).count(); () })
        val annComp = wm(() =>
          { graft.operators.Similarity.annRoute(probes, s"$dir-ivf",
            k = 5).count(); () })
        val bm25Comp = wm(() => bm25Serve())
        probes.unpersist()
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(s"$dir-ivf"))
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(s"$dir-bm25"))
        Map("lsh_delete" -> tDelLsh, "ivf_delete" -> tDelIvf,
          "bm25_delete" -> tDelBm25,
          "lsh_pairs_clean" -> pairsClean,
          "lsh_pairs_tombstoned" -> pairsTomb,
          "lsh_pairs_compacted" -> pairsComp,
          "ann_clean" -> annClean, "ann_tombstoned" -> annTomb,
          "ann_compacted" -> annComp,
          "bm25_clean" -> bm25Clean, "bm25_tombstoned" -> bm25Tomb,
          "bm25_compacted" -> bm25Comp)
      }
      val rs = axisSizes.map { case (nd, nv) => (nd, nv, bench(nd, nv)) }
      val ops = Seq("lsh_delete", "ivf_delete", "bm25_delete")
      val opJson = ops.map { k =>
        val ps = rs.map { case (nd, nv, m) =>
          (if (k == "ivf_delete") nv else nd, m(k)) }
        val e = fitExponent(ps)
        System.err.println(s"[scaling] forget $k: " +
          ps.map(p => s"${r3(p._2)}s@${p._1}").mkString(" -> ") +
          s" (exponent ${r3(e)})")
        val ptJson = ps.map { case (sz, t) =>
          s"""{"n":$sz,"t":${r3(t)}}""" }.mkString("[", ",", "]")
        s""""$k":{"n_dead":$nDead,"points":$ptJson,"exponent":${r3(e)}}"""
      }
      val paths = Seq("lsh_pairs" -> "lsh_pairs", "ann" -> "ann",
        "bm25" -> "bm25")
      val pathJson = paths.map { case (name, k) =>
        val ptJson = rs.map { case (nd, nv, m) =>
          val sz = if (k == "ann") nv else nd
          val ov = m(s"${k}_tombstoned") / m(s"${k}_clean")
          val cp = m(s"${k}_compacted") / m(s"${k}_clean")
          s"""{"n":$sz,"t_clean":${r3(m(s"${k}_clean"))},""" +
            s""""t_tombstoned":${r3(m(s"${k}_tombstoned"))},""" +
            s""""t_compacted":${r3(m(s"${k}_compacted"))},""" +
            s""""overhead":${r3(ov)},"overhead_compacted":${r3(cp)}}"""
        }.mkString("[", ",", "]")
        val ovMax = rs.map { case (_, _, m) =>
          m(s"${k}_tombstoned") / m(s"${k}_clean") }.max
        System.err.println(s"[scaling] forget $name serving overhead " +
          s"max ${r3(ovMax)}x across sizes")
        s""""${name}_serving":{"points":$ptJson,"overhead_max":${r3(ovMax)}}"""
      }
      (opJson ++ pathJson).mkString(",\"forget\":{", ",", "}")
    }
    val routeJson = if (withRoute) routeAxis() else ""
    val forgetJson = if (withForget) forgetAxis() else ""
    val json =
      s"""{"sf_small":"$sfSmall","sf_big":"$sfBig","row_ratio":$rowRatio,"passes":$passes,
         |"note":"query axis: exponent=log(t_big/t_small)/log(row_ratio), warm-min per (query,sf), <=0 means the fixed driver/planning floor dominates, >1.1 flags super-linear; route/forget axes (r13): index sizes a decade apart on SynthFixtures corpora (Zipf(1.1) 50k-word docs, clustered embeddings), exponent = least-squares slope of log t vs log n; route = fixed arrival batch vs index scale; forget = fixed-size tombstone deletes + serving overhead vs index scale. RECALL columns (r17): every approximate tier carries mean recall@k vs an exact ground truth AT EACH SIZE — bm25w = fixed-budget truncation (decays by the r16 law), bm25wf = df-proportional fraction layout on the LENGTH-VARIED corpus (pinned by construction; the constant-length corpus makes tf=1 postings impact ties, see zipfDocsVar), ann/ivfpq vs exhaustive-probe IVF on a 500-probe subsample; r18: ivfpqf = the PINNED compressed config (probeFraction=0.1 + rerankFraction=0.1 — both knobs serve fractions; the fixed-knob ivfpq column is the decay control), hybridwf = the doubly-fractional hybrid (df-proportional wand lexical leg + probeFraction vector leg) with fused-ranking recall vs the doubly-exact fusion on the same 500-query subsample",
         |"super_linear":${flagged.map("\"" + _ + "\"").mkString("[", ",", "]")},
         |"queries":{${entries.mkString(",")}}$routeJson$forgetJson}""".stripMargin.replace("\n", "")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}

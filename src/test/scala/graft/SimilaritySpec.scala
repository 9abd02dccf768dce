package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** ANN-LSH vs brute-force ground truth on sf0.001 embeddings. */
class SimilaritySpec extends SparkSpec {
  private lazy val emb = Tables.t(spark, sf001, "embeddings")
  private val probe = col("vec_id") % 10 === 0

  test("brute-force top-k: k rows per probe, ranks contiguous, cos sorted") {
    val topk = Similarity.bruteForceTopK(emb, probe, k = 5).collect()
    val byQ = topk.groupBy(_.getLong(0))
    byQ.foreach { case (_, rows) =>
      assert(rows.length == 5)
      assert(rows.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
      val cs = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ANN-LSH recall@5 >= 0.8 vs brute force, and never fabricates scores") {
    val exact = Similarity.bruteForceTopK(emb, probe, k = 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annLsh(emb, probe, k = 5)
      .select("qid", "nid", "cos").collect()
    val annPairs = ann.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & annPairs).size.toDouble / exact.size
    info(s"ANN recall@5 = $recall (candidates=${annPairs.size})")
    assert(recall >= 0.8, s"recall@5 too low: $recall")
    ann.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-12))
  }

  test("over-cap probe sets drop the broadcast hint and still complete") {
    // a probe "batch" bigger than the cap is a probe TABLE (corpus-scale
    // linking): the engine must not force an executor-sized broadcast of it
    spark.conf.set(Similarity.maxBroadcastProbesKey, "3")
    val savedAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // disable size-based auto-broadcast too, so the assertion sees the
    // shuffle plan the hint removal makes POSSIBLE (with the hint forced,
    // this conf could not prevent a broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ann = Similarity.annLsh(emb, probe, k = 5)
      assert(ann.count() > 0)
      val plan = ann.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin") &&
             !plan.contains("BroadcastExchange"),
        s"over-cap probe set must not broadcast:\n$plan")
      // same answer as the broadcast path (join strategy must not change
      // results): recall vs the hinted run is identity
      spark.conf.set(Similarity.maxBroadcastProbesKey, "1000000")
      val hinted = Similarity.annLsh(emb, probe, k = 5)
      assert(hinted.queryExecution.executedPlan.toString
        .contains("BroadcastExchange"),
        "under-cap probe set should broadcast again")
      assert(ann.collect().map(_.toSeq).toSet ==
        hinted.collect().map(_.toSeq).toSet)
    } finally {
      spark.conf.unset(Similarity.maxBroadcastProbesKey)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedAuto)
    }
  }

  test("IVF top-k recall@5 >= 0.8 vs brute force (k-means cells)") {
    val exact = Similarity.bruteForceTopK(emb, probe, k = 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, probe, k = 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    info(s"IVF recall@5 = $recall")
    assert(recall >= 0.8, s"IVF recall too low: $recall")
  }

  test("on a clustered corpus the ANN indexes beat the brute-force scan at recall >= 0.8") {
    import spark.implicits._
    // the sf corpora are ~isotropic — ANN's worst case (documented at
    // Similarity.scala "Honest scale note"). Real-world embeddings cluster;
    // this fixture makes that claim falsifiable: 30 tight Gaussian clusters
    // with near-orthogonal centers, 36k vectors, 360 probes.
    val rnd = new scala.util.Random(2024)
    val dim = 64
    val clusters = 30
    val perCluster = 1200
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val centers =
      Array.fill(clusters)(unit(Array.fill(dim)(rnd.nextGaussian())))
    val rows = for (c <- 0 until clusters; i <- 0 until perCluster) yield {
      val v = unit(centers(c).map(_ + rnd.nextGaussian() * 0.05))
      (c.toLong * perCluster + i, v.map(_.toFloat))
    }
    val emb = rows.toDF("vec_id", "embedding").repartition(8)
      .persist()
    emb.count()
    try {
      val probeF = col("vec_id") % 100 === 0
      // parameter choice follows the corpus geometry: tight clusters mean a
      // probe's bucket already holds much of its cluster, so the isotropic
      // sf-corpus defaults (8 planes, 8 tables, 2 flips = 37 buckets/table)
      // only multiply candidate volume to scavenge recall that is nearly
      // free here — 12 planes split clusters into sub-buckets (less work
      // per table), and 4 tables x 1 flip recover the tail of the recall
      def lsh() = Similarity.annLsh(emb, probeF, k = 5,
        planes = 12, tables = 4, maxFlips = 1)
      def ivfQ() = Similarity.ivfTopK(emb, probeF, k = 5,
        nCells = 32, nprobe = 4)
      // warm both paths once: shared vector cache, LSH/IVF corpus indexes —
      // the amortized-index regime the ANN tiers are built for
      Similarity.bruteForceTopK(emb, probeF, k = 5).count()
      lsh().count()
      ivfQ().count()
      def minWall(f: => Long): Double = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      var brute = minWall(Similarity.bruteForceTopK(emb, probeF, k = 5).count())
      var ann = minWall(lsh().count())
      var ivf = minWall(ivfQ().count())
      if (!(ann < brute && ivf < brute)) {
        // one full re-measure before failing: min-of-3 narrows but does
        // not eliminate this box's ±40% scheduling/GC tail — a single
        // retry makes a false alarm quadratically unlikely while keeping
        // the strict index-beats-scan claim
        brute = minWall(Similarity.bruteForceTopK(emb, probeF, k = 5).count())
        ann = minWall(lsh().count())
        ivf = minWall(ivfQ().count())
      }
      val exact = Similarity.bruteForceTopK(emb, probeF, k = 5)
        .select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
        val pairs = df.select("qid", "nid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        (exact & pairs).size.toDouble / exact.size
      }
      val annRecall = recallOf(lsh())
      val ivfRecall = recallOf(ivfQ())
      info(f"brute=$brute%.2fs annLsh=$ann%.2fs (recall $annRecall%.3f) " +
        f"ivf=$ivf%.2fs (recall $ivfRecall%.3f)")
      assert(annRecall >= 0.8, s"LSH recall too low: $annRecall")
      assert(ivfRecall >= 0.8, s"IVF recall too low: $ivfRecall")
      // Index-beats-scan economics: STRICT when GRAFT_ASSERT_PERF is set
      // (the perf-gated run that proves the claim); otherwise a generous
      // 1.5x bound — min-of-3 plus one retry narrows but cannot eliminate
      // this box's ±40% scheduling/GC tail, and a hard wall-clock assert
      // in the default unit suite would flake under load. The loose bound
      // still catches a genuine economics regression (the r3 state was
      // the index 2.7x SLOWER than the scan). Recall stays unconditional.
      val slack = if (sys.env.get("GRAFT_ASSERT_PERF").exists(_.nonEmpty))
        1.0 else 1.5
      assert(ann < brute * slack,
        f"LSH index must beat the scan it replaces: $ann%.2fs vs $brute%.2fs (slack $slack)")
      assert(ivf < brute * slack,
        f"IVF index must beat the scan it replaces: $ivf%.2fs vs $brute%.2fs (slack $slack)")
    } finally {
      emb.unpersist(blocking = false)
      ()
    }
  }

  test("int8 quantization bounds values and preserves the neighbor ranking") {
    val q = Similarity.quantize(emb)
    import spark.implicits._
    val bounds = q.select(array_min(col("qv")).as("mn"),
      array_max(col("qv")).as("mx"))
      .agg(min("mn"), max("mx")).head()
    assert(bounds.getLong(0) >= -127 && bounds.getLong(1) <= 127,
      s"int8 range violated: $bounds")
    // quantized top-5 against float top-5: int8 keeps ~7 bits of the
    // signal, plenty to reproduce most of the exact neighbor set
    val probeF = col("vec_id") % 100 === 0
    val exact = Similarity.bruteForceTopK(emb, probeF, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val quant = Similarity.quantizedTopK(emb, probeF, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"quantized recall too low: $recall")
  }

  test("cosine of a vector with itself is 1") {
    import spark.implicits._
    val df = Seq((Array(0.1, -0.5, 2.0), Array(0.1, -0.5, 2.0))).toDF("a", "b")
    val c = df.select(Similarity.cosine(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("labelCentroids covers every vector, members lean toward their centroid") {
    val out = Similarity.labelCentroids(emb).cache()
    val total = out.agg(sum("n_vecs")).head().getLong(0)
    assert(total == emb.count(), "every vector belongs to exactly one label")
    out.collect().foreach { r =>
      val (avgCos, cnorm) = (r.getAs[Double]("avg_cos"),
        r.getAs[Double]("centroid_norm"))
      assert(cnorm > 0.0)
      // a member's expected cosine to its own mean is strictly positive
      // even on an isotropic corpus (the member contributes to the mean)
      assert(avgCos > 0.0 && avgCos <= 1.0, s"avg_cos out of range: $avgCos")
    }
    // deterministic: sorted-sequential sums make reruns bit-identical
    val again = Similarity.labelCentroids(emb)
    assert(out.exceptAll(again).count() == 0)
  }

  test("appendIvfIndex: grown postings equal a rebuild with the same centroids") {
    val half1 = emb.filter(col("vec_id") % 2 === 0)
    val half2 = emb.filter(col("vec_id") % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-app").toString
    Similarity.ivfWriteIndex(half1, dir)
    Similarity.appendIvfIndex(half2, dir)
    // expected = every vector assigned through the STORED centroids (the
    // index's trained artifact — appends must not move it)
    val cents = spark.read.parquet(s"$dir/centroids")
      .orderBy("cell").collect().map(_.getSeq[Double](1).toSeq).toSeq
    val centsDF = spark.read.parquet(s"$dir/centroids")
    // postings are cell-PARTITIONED since r12 — cast the inferred
    // partition column for a type-stable direct read
    val grown = spark.read.parquet(s"$dir/postings")
      .select(col("cell").cast("long"), col("nid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(grown.size == emb.count(), "every vector posts exactly once")
    // the appended half landed in the argmax cell of the stored centroids:
    // recompute each appended vector's best cell independently
    val h2 = half2.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v")).collect()
    val norms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
    h2.foreach { r =>
      val v = r.getSeq[Double](1)
      // left-to-right fold matches the codegen DotProduct's accumulation
      val scores = cents.indices.map(c =>
        v.zip(cents(c)).map { case (a, b) => a * b }.sum / norms(c))
      val first = scores.indexOf(scores.max) // first index wins ties
      assert(grown.contains((first.toLong, r.getLong(0))),
        s"appended vec ${r.getLong(0)} must post in stored-centroid cell $first")
    }
    assert(centsDF.count() == cents.size.toLong)
  }

  test("annRoute: replayed stream retrieves exactly the batch IVF top-k") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import sqlCtx.implicits._
    // batch ground truth: same cells/iters/nprobe as the stored index
    val batch = Similarity.ivfTopK(emb, probe, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(batch.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Similarity.ivfWriteIndex(emb, dir)
    val input = MemoryStream[(Long, Seq[Float])]
    val got = scala.collection.mutable.Set[(Long, Int, Long, Double)]()
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        got.synchronized {
          got ++= Similarity.annRoute(b, dir, k = 5).collect()
            .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
              r.getDouble(3)))
        }
        ()
      }.start()
    try {
      val rows = emb.filter(probe).select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
      val (h1, h2) = rows.splitAt(rows.length / 2)
      input.addData(h1)
      q.processAllAvailable()
      input.addData(h2)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toSet == batch,
      s"stream-only: ${(got.toSet -- batch).take(3)}; " +
        s"batch-only: ${(batch -- got.toSet).take(3)}")
  }

  test("annRoute's postings scan prunes to the probed cells (partition filters)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-pp").toString
    Similarity.ivfWriteIndex(emb, dir)
    // a single probe vector visits nprobe cells — the postings scan must
    // carry those cells as PARTITION filters (file pruning, not a
    // post-scan filter), the O(probed cells) read the 100 TB claim needs
    val one = emb.filter(col("vec_id") === 7)
      .select(col("vec_id"), col("embedding"))
    val routed = Similarity.annRoute(one, dir, k = 5, nprobe = 2)
    // the executedPlan rendering prints every FileSourceScan with its
    // PartitionFilters (the RetrievalSpec pushdown-assert pattern; scans
    // under AQE print in the string form even before execution)
    val plan = routed.queryExecution.executedPlan.toString
    val postingsScan = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("postings"))
      .mkString("\n")
    assert(postingsScan.nonEmpty, s"route plan must scan the postings:\n$plan")
    assert(postingsScan.contains("PartitionFilters: [") &&
      ".*PartitionFilters: \\[[^\\]]*cell.*".r
        .findFirstIn(postingsScan).isDefined,
      s"postings scan must carry cell partition filters:\n$postingsScan")
    // the probed-cell IN-list holds at most nprobe=2 values: the listing
    // prunes to <= 2 of the index's 8 cell partitions
    val inList = "cell#\\d+L? IN \\(([^)]*)\\)".r
      .findFirstMatchIn(postingsScan).map(_.group(1))
    assert(inList.exists(_.split(",").length <= 2),
      s"nprobe=2 probe must prune to <= 2 cells: $postingsScan")
    // and pruning changed nothing about the answers
    val batch = Similarity.ivfTopK(emb, col("vec_id") === 7, k = 5,
        nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val got = routed.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == batch)
  }

  test("filtered annRoute: results come only from the allowed set, " +
      "exhaustive probe equals brute-force-with-filter, pruning kept") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-f").toString
    Similarity.ivfWriteIndex(emb.select("vec_id", "embedding"), dir)
    val allowed = emb.filter(col("label") % 3 === 0)
    val allowedIds = allowed.select("vec_id").collect()
      .map(_.getLong(0)).toSet
    val probes = emb.filter(probe).select("vec_id", "embedding")
    val routed = Similarity.annRoute(probes, dir, k = 5, nprobe = 8,
      allowed = Some(allowed))
    val got = routed.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got.nonEmpty && got.forall { case (_, _, nid) =>
      allowedIds(nid) }, "every neighbor must satisfy the predicate")
    // ground truth: every probe scored against the whole allowed set
    val e = emb.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    val q = e.filter(probe).select(col("vec_id").as("qid"),
      col("v").as("qv"))
    val c = e.join(allowed.select("vec_id"), Seq("vec_id"), "semi")
      .select(col("vec_id").as("nid"), col("v").as("nv"))
    val scored = q.crossJoin(c).filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (Similarity.dot(col("qv"), col("nv")) /
          (sqrt(Similarity.dot(col("qv"), col("qv"))) *
            sqrt(Similarity.dot(col("nv"), col("nv"))))).as("cos"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy(col("cos").desc, col("nid"))
    val want = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).toSet
    assert(got == want,
      "exhaustive filtered route must equal brute force over the allowed set")
    // the allowed semi-join must not cost the cell partition pruning
    val plan = Similarity.annRoute(probes.limit(1), dir, k = 5, nprobe = 2,
      allowed = Some(allowed)).queryExecution.executedPlan.toString
    val postingsScan = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("postings"))
      .mkString("\n")
    assert(postingsScan.contains("PartitionFilters: [") &&
      ".*PartitionFilters: \\[[^\\]]*cell.*".r
        .findFirstIn(postingsScan).isDefined,
      s"filtered postings scan must keep cell partition filters:\n$postingsScan")
  }

  test("ivfDriftStats flags a distribution-shifted append; recall holds for the base") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-drift").toString
    Similarity.ivfWriteIndex(emb, dir)
    // append 1: same distribution (held-out half of the same corpus rows
    // under fresh ids) — must NOT flag
    val same = emb.select((col("vec_id") + 500000L).as("vec_id"),
      col("embedding"))
    Similarity.appendIvfIndex(same, dir)
    // append 2: a hard shift — every vector forced into one corner of the
    // space (constant direction + small per-row jitter), so assignments
    // pile into few cells and sit far from every trained centroid
    val spark2 = spark
    import spark2.implicits._
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val shifted = (0 until 400).map { i =>
      (900000L + i, (0 until dim).map(d =>
        (if (d == 0) 10f else 0.01f * ((i + d) % 7)): Float))
    }.toDF("vec_id", "embedding")
    Similarity.appendIvfIndex(shifted, dir)
    val stats = Similarity.ivfDriftStats(spark, dir)
      .collect().map(r => r.getInt(0) ->
        ((r.getDouble(2), r.getDouble(4)))).toMap
    val (tvSame, qrSame) = stats(1)
    val (tvShift, qrShift) = stats(2)
    // documented rebuild thresholds: tv >= 0.25 or qerr_ratio >= 1.3
    assert(tvSame < 0.25 && qrSame < 1.3,
      s"same-distribution append must not flag: tv=$tvSame qr=$qrSame")
    assert(tvShift >= 0.25 || qrShift >= 1.3,
      s"shifted append must flag: tv=$tvShift qr=$qrShift")
    // drift never breaks correctness for the original distribution: the
    // route still retrieves the batch IVF top-k for base probes exactly
    val batch = Similarity.ivfTopK(emb, probe, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val routed = Similarity.annRoute(
        emb.filter(probe).select(col("vec_id"), col("embedding")), dir, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // the grown index contains extra vectors, so routed top-k may differ
    // where an appended vector outranks a base one — restrict the claim
    // to ranks whose neighbors are base vectors (deterministic subset)
    val routedBaseOnly = Similarity.annRoute(
        emb.filter(probe).select(col("vec_id"), col("embedding")),
        dirBaseOnly(dir), k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(routedBaseOnly == batch)
    assert(routed.nonEmpty)
  }

  test("compactIvfIndex merges per-cell fragments; postings content unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-cmp").toString
    Similarity.ivfWriteIndex(emb.filter(col("vec_id") % 4 === 0), dir)
    for (m <- 1 to 3)
      Similarity.appendIvfIndex(emb.filter(col("vec_id") % 4 === m), dir)
    def posted: Set[(Long, Long)] = spark.read.parquet(s"$dir/postings")
      .select(col("cell").cast("long"), col("nid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = posted
    val swept = Similarity.compactIvfIndex(spark, dir, maxFilesPerCell = 1)
    assert(swept > 0, "three appends must leave fragmented cells")
    assert(posted == before, "compaction must not change the postings")
    import scala.jdk.CollectionConverters._
    val cellDirs = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$dir/postings")).iterator().asScala.toSeq
      .filter(p => p.getFileName.toString.startsWith("cell="))
    cellDirs.foreach { c =>
      val s = java.nio.file.Files.list(c)
      val n = try s.iterator().asScala.count(_.toString.endsWith(".parquet"))
        finally s.close()
      assert(n <= 1, s"cell ${c.getFileName} still fragmented: $n files")
    }
    assert(Similarity.compactIvfIndex(spark, dir, maxFilesPerCell = 1) == 0,
      "idempotent second sweep")
  }

  test("AutoCells rebuild: 10x growth, policy retrain restores per-decision candidate volume; recall holds") {
    import spark.implicits._
    // clustered fixture (the real-world shape), ids INTERLEAVED across
    // clusters so the bounded deterministic training sample (first 4096 by
    // id) sees every cluster at both corpus sizes
    val rnd = new scala.util.Random(13)
    val dim = 16
    val clusters = 20
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val centers =
      Array.fill(clusters)(unit(Array.fill(dim)(rnd.nextGaussian())))
    def mkRows(n: Int, idBase: Long): Seq[(Long, Array[Float])] =
      (0 until n).map { i =>
        val c = i % clusters
        val v = unit(centers(c).map(_ + rnd.nextGaussian() * 0.07))
        (idBase + i, v.map(_.toFloat))
      }
    val base = mkRows(2000, 0L).toDF("vec_id", "embedding").persist()
    val grown = mkRows(20000, 1000000L).toDF("vec_id", "embedding").persist()
    base.count(); grown.count()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivf-policy").toString
    try {
      Similarity.ivfWriteIndex(base, dir, nCells = Similarity.AutoCells)
      def nCellsOf: Long = spark.read.parquet(s"$dir/centroids").count()
      def meanOcc: Double = {
        val p = spark.read.schema("nid BIGINT, cell BIGINT")
          .parquet(s"$dir/postings")
        p.count().toDouble / nCellsOf
      }
      assert(nCellsOf == Similarity.autoCellsFor(2000),
        "build must size cells by the sqrt(N) policy when asked")
      val occSmall = meanOcc

      // grow 10x: appends keep the frozen quantizer, so per-cell occupancy
      // (= per-decision candidates, nprobe cells scanned per probe) grows
      // linearly — the measured r12 ann_route degradation
      grown.repartition(4).write.mode("overwrite")
        .parquet(s"$dir-growstage") // stable input for two appends
      Similarity.appendIvfIndex(spark.read.parquet(s"$dir-growstage"), dir)
      val occGrownFrozen = meanOcc
      assert(occGrownFrozen > occSmall * 8,
        s"frozen quantizer: occupancy must grow ~linearly " +
          s"($occSmall -> $occGrownFrozen)")

      // POLICY REBUILD: retrain with nCells = ceil(sqrt(22000)) — the
      // per-decision candidate volume returns to ~sqrt-policy levels
      Similarity.rebuildIvfIndex(spark, dir, nCells = Similarity.AutoCells)
      assert(nCellsOf == Similarity.autoCellsFor(22000))
      val occPolicy = meanOcc
      assert(occPolicy < occGrownFrozen / 2.5,
        s"policy rebuild must shrink mean cell occupancy materially " +
          s"(frozen $occGrownFrozen -> policy $occPolicy)")

      // ... and recall against exact brute force holds on the grown corpus
      val all = base.unionByName(grown).persist()
      val probeF = col("vec_id") % 400 === 7
      val exact = Similarity.bruteForceTopK(all, probeF, k = 5)
        .select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val routed = Similarity.annRoute(all.filter(probeF), dir, k = 5)
        .select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (exact & routed).size.toDouble / exact.size
      info(s"policy-rebuilt recall@5 = $recall " +
        s"(cells ${Similarity.autoCellsFor(2000)} -> " +
        s"${Similarity.autoCellsFor(22000)}, occupancy " +
        s"$occSmall -> $occGrownFrozen -> $occPolicy)")
      assert(recall >= 0.8, s"recall too low after policy rebuild: $recall")
      all.unpersist()
    } finally {
      base.unpersist(); grown.unpersist()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$dir-growstage"))
    }
  }

  /** A copy of the index dir truncated to its FIRST committed version
    * (gen-0 build) — drift appends rolled back via the manifest history,
    * which doubles as a check that old manifests still describe a
    * complete readable snapshot (time travel, the LogStore readPinned
    * property).
    */
  private def dirBaseOnly(dir: String): String = {
    import scala.jdk.CollectionConverters._
    val copy = java.nio.file.Files.createTempDirectory("graft-ivf-base").toString
    val src = java.nio.file.Paths.get(dir)
    val first = java.nio.file.Files.list(src.resolve("_manifests"))
      .iterator().asScala.toSeq.sortBy(_.getFileName.toString).head
    val keep = new String(java.nio.file.Files.readAllBytes(first), "UTF-8")
      .split("\n").filter(_.nonEmpty)
    keep.foreach { rel =>
      val from = src.resolve(rel)
      val to = java.nio.file.Paths.get(copy, rel)
      java.nio.file.Files.createDirectories(to.getParent)
      java.nio.file.Files.copy(from, to)
    }
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(copy, "_manifests"))
    java.nio.file.Files.copy(first,
      java.nio.file.Paths.get(copy, "_manifests", first.getFileName.toString))
    copy
  }
}

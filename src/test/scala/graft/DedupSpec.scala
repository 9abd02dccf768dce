package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dedup operators: exact, n-gram Jaccard, MinHash-LSH, SimHash, embedding
  * cosine — on sf0.001 documents with planted duplicates.
  */
class DedupSpec extends SparkSpec {
  private lazy val docs = Tables.t(spark, sf001, "documents")
  private lazy val augmented = docs.unionByName(
    docs.filter(col("doc_id") % 50 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L))

  test("exact dedup collapses planted copies to min-id keeper") {
    val out = Dedup.exactDedup(augmented).cache()
    val dups = out.filter(col("n_copies") > 1)
    assert(dups.count() == docs.filter(col("doc_id") % 50 === 0).count())
    // keeper is always the original (min) id
    assert(dups.filter(col("doc_id") >= 1000000L).count() == 0)
  }

  test("hash-based exact dedup agrees with text-based") {
    val byText = Dedup.exactDedup(augmented).select("doc_id", "n_copies")
    val byHash = Dedup.exactDedupByHash(augmented).select("doc_id", "n_copies")
    assert(byText.exceptAll(byHash).count() == 0)
    assert(byHash.exceptAll(byText).count() == 0)
  }

  test("minhash-LSH pairs equal exact n-gram Jaccard pairs (planted near-dups)") {
    val exact = Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.6)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, k = 3, numHashes = 32, bands = 16,
      threshold = 0.6)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain planted near-duplicates")
    assert(lsh == exact)
  }

  test("prefix-filtered Jaccard equals brute force on a random corpus") {
    import spark.implicits._
    // adversarial-ish corpus for the PPJoin bounds: small shared vocab =>
    // heavy shingle co-occurrence, doc lengths spanning the length filter
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 30).map(i => s"w$i")
    val base = (0 until 40).map { i =>
      val len = 8 + rnd.nextInt(30)
      i.toLong -> Vector.fill(len)(vocab(rnd.nextInt(vocab.size)))
    }
    // planted near-copies: mutate 0-3 random positions of a base doc
    val mutated = (0 until 30).map { j =>
      val (srcId, toks) = base(rnd.nextInt(base.size))
      val nMut = rnd.nextInt(4)
      val out = (1 to nMut).foldLeft(toks)((t, _) =>
        t.updated(rnd.nextInt(t.size), vocab(rnd.nextInt(vocab.size))))
      (1000L + j, out) -> srcId
    }.map(_._1)
    val corpus = (base ++ mutated).map { case (id, t) => id -> t.mkString(" ") }
    val got = Dedup.ngramJaccardPairs(corpus.toDF("doc_id", "text"),
        k = 2, threshold = 0.5)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def sh(t: String) = t.split(" ", -1).sliding(2).map(_.mkString(" ")).toSet
    val sets = corpus.map { case (id, t) => id -> sh(t) }
    val expected = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size if inter > 0
      if inter.toDouble / (sa.size + sb.size - inter) >= 0.5
    } yield (a, b)).toSet
    assert(expected.nonEmpty, "random corpus should contain similar pairs")
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
    // the EXACT stored-prefix route must recover the same brute-force set
    // when the corpus replays as arrivals — independent validation of the
    // static-hash-order symmetric/asymmetric prefix bounds and the PPJoin
    // positional filter at a non-default threshold
    val dir = java.nio.file.Files.createTempDirectory("graft-routeprop").toString
    Dedup.writeLshIndex(corpus.toDF("doc_id", "text"), dir, k = 2,
      prefixThreshold = 0.5)
    val routed = Dedup.jaccardRoute(corpus.toDF("doc_id", "text"), dir,
        k = 2, threshold = 0.5)
      .select("da", "db").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(routed == expected,
      s"route missing=${expected -- routed} extra=${routed -- expected}")
  }

  test("document-frequency cut drops stop-word shingles (hot-key bound)") {
    import spark.implicits._
    // every doc shares the 'alpha beta gamma delta' shingles (df = 1200 >
    // maxBucketSize = 1000) — without the cut, every pair would reach
    // Jaccard 0.2 >= 0.1 and candidate generation would be ~700k pairs;
    // with it, the shared shingles are dropped BEFORE any posting list
    // materializes and the remaining per-doc shingles are disjoint
    val hot = (0 until 1200)
      .map(i => (i.toLong, s"alpha beta gamma delta u$i v$i w$i"))
      .toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPairs(hot, k = 3, threshold = 0.1).count() == 0)
  }

  test("cluster components merge chains; dedup corpus keeps one rep per cluster") {
    import spark.implicits._
    // chain topology: 1-2, 2-3 (no 1-3 edge) must still form ONE cluster;
    // 10-11 a separate cluster; 2 also links to 4 (star)
    val pairs = Seq((1L, 2L), (2L, 3L), (2L, 4L), (10L, 11L))
      .toDF("da", "db").withColumn("jaccard", lit(0.9))
    val expected = Set((1L, 4L, 4L), (10L, 2L, 11L))
    // driver union-find path AND distributed label-propagation path
    val viaDriver = Dedup.dedupClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaPropagation = Dedup.dedupClusters(pairs, driverPairLimit = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaDriver == expected)
    assert(viaPropagation == expected)

    val docs = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L).map(i => (i, s"text $i"))
      .toDF("doc_id", "text")
    val kept = Dedup.dedupCorpus(docs, pairs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // reps 1 and 10 survive, unpaired 5 survives, the rest drop
    assert(kept == Set(1L, 5L, 10L))
  }

  test("large-star/small-star components equal union-find and label propagation on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // seeded random graphs incl. the star algorithm's worst-ish shapes:
    // long chains (deep trees) and dense blobs (heavy star overlap)
    val graphs = Seq(
      (0 until 16).map(i => (i.toLong, i + 1L)),                   // one chain
      (0 until 40).map(_ => (rnd.nextInt(15).toLong,               // dense blob
        15L + rnd.nextInt(15))),
      (0 until 30).map(_ => (rnd.nextInt(40).toLong,               // sparse:
        rnd.nextInt(40).toLong)).filter(p => p._1 != p._2),        // many comps
      Seq((5L, 5L), (1L, 2L)).++((0 until 20).map(_ =>             // self loops
        (rnd.nextInt(10).toLong, rnd.nextInt(10).toLong)))
        .filter(p => p._1 != p._2))
    graphs.zipWithIndex.foreach { case (es, gi) =>
      val pairs = es.toDF("da", "db")
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val star = rows(Dedup.starComponents(pairs))
      val unionFind = rows(Dedup.dedupClusters(pairs))
      val propagation = rows(Dedup.distributedComponents(
        pairs.select("da", "db"), maxIters = 40))
      assert(star == unionFind, s"graph $gi: star != union-find")
      assert(star == propagation, s"graph $gi: star != propagation")
    }
  }

  test("simhash finds planted exact duplicates at hamming 0") {
    val pairs = Dedup.simhashPairs(augmented, maxDist = 3).cache()
    val planted = docs.filter(col("doc_id") % 50 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val zeroDist = pairs.filter(col("hamming") === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    planted.foreach { id =>
      assert(zeroDist.contains((id, id + 1000000L)),
        s"planted dup pair ($id, ${id + 1000000L}) not found")
    }
  }

  test("semantic pairs: planted duplicate co-blocks; output is exact-cosine-verified") {
    val emb = Tables.t(spark, sf001, "embeddings")
    // a planted exact copy shares its dominant dimension by construction,
    // so cell blocking MUST surface it at cosine ~1
    val planted = emb.unionByName(emb.filter(col("vec_id") === 7)
      .withColumn("vec_id", lit(900007L)))
    val pairs = Dedup.semanticPairs(planted, tau = 0.3).cache()
    val hit = pairs.filter(col("da") === 7 && col("db") === 900007L)
      .select("cos").collect()
    assert(hit.length == 1 && math.abs(hit(0).getDouble(0) - 1.0) < 1e-9,
      "planted duplicate must co-block and score cosine ~1")
    // every reported pair is a genuine threshold pair (blocking only cuts
    // candidates, never fabricates: cos is computed exactly, post-block)
    assert(pairs.filter(col("cos") < 0.3 || col("cos") > 1.0 + 1e-12)
      .count() == 0)
    // and reported pairs are a SUBSET of the unblocked threshold pairs
    val all = Dedup.embeddingPairs(planted, threshold = 0.3, lit(true))
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = pairs.select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(all), s"blocking fabricated pairs: ${got -- all}")
    pairs.unpersist(blocking = false)
    ()
  }

  test("embedding cosine pairs are within [-1, 1] and self-free") {
    val pairs = Dedup.embeddingPairs(Tables.t(spark, sf001, "embeddings"),
      threshold = 0.3, probeFilter = col("vec_id") % 10 === 0).collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-12)
      assert(r.getDouble(2) >= 0.3)
    }
  }

  test("fuzzyPairs: affix typos AND token reorders pair up; both-affix character edits and big blocks are the documented misses") {
    val spark2 = spark
    import spark2.implicits._
    val base = "the quick brown fox jumps over seventeen lazy dogs tonight"
    val rows = Seq(
      1L -> base,
      2L -> (base + " ok"),             // suffix edit, distance 3 -> prefix block pairs it
      3L -> ("Xhe" + base.drop(3)),     // edit INSIDE the 24-char prefix, distance 1 -> the SUFFIX block catches what a prefix-only blocker provably loses
      4L -> "completely unrelated text with nothing in common at all",
      5L -> (base + " okay"),           // distance 5 from base -> verified out; distance 2 from doc 2
      6L -> ("Xq " + base.drop(3) + " oX"), // character edits in BOTH affixes altering the token multiset -> all three blocks miss (the residual documented miss)
      7L -> ("a b " + base + " c d"),   // token-reorder siblings: both affixes differ
      8L -> ("b a " + base + " d c"))   //   but the sorted-token block pairs them at distance 4
    val pairs = graft.operators.Dedup.fuzzyPairs(
        rows.toDF("doc_id", "text"), maxEdit = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 3), (2L, 5L, 2), (1L, 3L, 1), (7L, 8L, 4)),
      s"affix-typo + token-reorder pairs within maxEdit only (1-5 at " +
        s"distance 5 is out, both-affix-edit doc 6 escapes all blocks), got $pairs")
    // oversize blocks drop before any pair forms (the df-cut rule) —
    // the flood shares BOTH affixes, so both key families must cut it
    val flood = (1L to 12L).map(i => i -> base)
    val capped = graft.operators.Dedup.fuzzyPairs(
      flood.toDF("doc_id", "text"), maxEdit = 3, maxBlockSize = 10)
    assert(capped.count() == 0, "a block past maxBlockSize yields no pairs")
  }
}

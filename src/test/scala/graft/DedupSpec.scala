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

  test("embedding cosine pairs are within [-1, 1] and self-free") {
    val pairs = Dedup.embeddingPairs(Tables.t(spark, sf001, "embeddings"),
      threshold = 0.3, probeFilter = col("vec_id") % 10 === 0).collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-12)
      assert(r.getDouble(2) >= 0.3)
    }
  }
}

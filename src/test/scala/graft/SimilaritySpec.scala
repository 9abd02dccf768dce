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

  test("IVF top-k recall@5 >= 0.8 vs brute force (k-means cells)") {
    val exact = Similarity.bruteForceTopK(emb, probe, k = 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, probe, k = 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    info(s"IVF recall@5 = $recall")
    assert(recall >= 0.8, s"IVF recall too low: $recall")
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
}

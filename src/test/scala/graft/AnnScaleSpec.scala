package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** ANN recall AT SCALE and the `probeFraction` knob (r17 — the WAND
  * lesson applied to vectors, VERDICT r16 ask #2): under the AutoCells
  * sqrt(N)-cell policy a FIXED nprobe probes a shrinking fraction of
  * cells as the corpus grows, and measured recall decays with it
  * (SCALING_r17: ann_route 0.974 -> 0.788 -> 0.440 across 2k/20k/200k
  * vectors at nprobe 5). `probeFraction` pins the probed-cell fraction
  * — nprobe_eff = max(nprobe, ceil(nCells x fraction)) — which pins
  * recall on stationary geometry, at candidates ~ fraction x N per
  * probe (the honest cost: pinned recall and sublinear per-decision
  * cost cannot coexist for exhaustive-in-cell scoring).
  */
class AnnScaleSpec extends SparkSpec {

  private val k = 5
  private val frac = 0.1

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-annscale").toString

  private def ids(df: DataFrame): DataFrame =
    df.select(col("qid"), col("nid").as("id"))

  private def recallVs(exact: DataFrame, got: DataFrame): Double = {
    val nEx = exact.groupBy("qid").agg(count(lit(1)).as("n_ex"))
    val nHit = exact.join(got, Seq("qid", "id"), "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("n_hit"))
    nEx.join(nHit, Seq("qid"), "left")
      .agg(avg(coalesce(col("n_hit"), lit(0L)).cast("double") /
        col("n_ex"))).collect()(0).getDouble(0)
  }

  test("probeFraction pins IVF recall across a vector decade where the " +
      "fixed nprobe decays") {
    val probes = graft.tools.SynthFixtures
      .clusteredEmbeddings(spark, 200L, seed = 99L)
      .select((col("vec_id") + 1000000000L).as("vec_id"), col("embedding"))
      .persist()
    probes.count()
    val res = Seq(2000L, 20000L).map { n =>
      val emb = spark.read
        .parquet(graft.tools.SynthFixtures.ensureEmbeddings(spark, n))
      val dir = tmp()
      Similarity.ivfWriteIndex(emb, dir,
        nCells = Similarity.AutoCells)
      val exact = ids(Similarity.annRoute(probes, dir, k = k,
        nprobe = 1 << 20)).persist()
      exact.count()
      val fixed = recallVs(exact,
        ids(Similarity.annRoute(probes, dir, k = k)))
      val frc = recallVs(exact,
        ids(Similarity.annRoute(probes, dir, k = k,
          probeFraction = frac)))
      exact.unpersist()
      info(f"n=$n fixed-nprobe recall@$k=$fixed%.3f " +
        f"probeFraction=$frac recall@$k=$frc%.3f")
      (n, fixed, frc)
    }
    val (fixedSmall, fixedBig) = (res(0)._2, res(1)._2)
    val fracBig = res(1)._3
    assert(fixedBig < fixedSmall - 0.05,
      f"the fixture must show the fixed-nprobe decay across the decade " +
        f"(got $fixedSmall%.3f -> $fixedBig%.3f)")
    res.foreach { case (n, _, fr) =>
      assert(fr >= 0.9,
        f"probeFraction=$frac must hold recall@$k >= 0.9 at $n vectors " +
          f"(got $fr%.3f)")
    }
    assert(fracBig > fixedBig + 0.05,
      f"the pinned fraction must dominate the fixed knob at the grown " +
        f"size (got $fracBig%.3f vs $fixedBig%.3f)")
    probes.unpersist()
  }

  test("rerankFraction pins IVF-PQ recall across a vector decade where " +
      "the fixed rerank*k window truncates the fraction-grown pool") {
    val probes = graft.tools.SynthFixtures
      .clusteredEmbeddings(spark, 200L, seed = 99L)
      .select((col("vec_id") + 1000000000L).as("vec_id"), col("embedding"))
      .persist()
    probes.count()
    val res = Seq(2000L, 20000L).map { n =>
      val emb = spark.read
        .parquet(graft.tools.SynthFixtures.ensureEmbeddings(spark, n))
      val dir = tmp()
      Similarity.ivfWriteIndex(emb, dir,
        nCells = Similarity.AutoCells, pqM = 16, pqK = 16)
      val exact = ids(Similarity.annRoute(probes, dir, k = k,
        nprobe = 1 << 20)).persist()
      exact.count()
      // CONTROL: probeFraction alone — the r17 residual. The pool grows
      // as fraction x N but the rerank window stays rerank*k
      val fracOnly = recallVs(exact,
        ids(Similarity.pqRoute(probes, dir, k = k, nprobe = 5,
          rerank = 8, probeFraction = frac)))
      // BOTH knobs fractional: the window scales with the pool
      val fracRr = recallVs(exact,
        ids(Similarity.pqRoute(probes, dir, k = k, nprobe = 5,
          rerank = 8, probeFraction = frac, rerankFraction = frac)))
      exact.unpersist()
      info(f"n=$n pq probeFraction-only recall@$k=$fracOnly%.3f " +
        f"+rerankFraction=$frac recall@$k=$fracRr%.3f")
      (n, fracOnly, fracRr)
    }
    res.foreach { case (n, _, rr) =>
      assert(rr >= 0.9,
        f"probeFraction+rerankFraction must hold IVF-PQ recall@$k >= " +
          f"0.9 at $n vectors (got $rr%.3f)")
    }
    val (fracOnlyBig, fracRrBig) = (res(1)._2, res(1)._3)
    assert(fracRrBig > fracOnlyBig + 0.05,
      f"the fractional rerank window must dominate the fixed window at " +
        f"the grown size (got $fracRrBig%.3f vs $fracOnlyBig%.3f)")
    probes.unpersist()
  }

  test("probed_fraction regime signal: shrinks with the cell count at " +
      "fixed nprobe, stays ~fraction under probeFraction, on both routes") {
    val probes = graft.tools.SynthFixtures
      .clusteredEmbeddings(spark, 20L, seed = 99L)
      .select((col("vec_id") + 1000000000L).as("vec_id"), col("embedding"))
    def served(df: DataFrame): Double = {
      val vs = df.select("probed_fraction").distinct()
        .collect().map(_.getDouble(0)).toSeq
      assert(vs.size == 1, s"probed_fraction must be one literal: $vs")
      vs.head
    }
    val res = Seq(2000L, 20000L).map { n =>
      val emb = spark.read
        .parquet(graft.tools.SynthFixtures.ensureEmbeddings(spark, n))
      val dir = tmp()
      Similarity.ivfWriteIndex(emb, dir,
        nCells = Similarity.AutoCells, pqM = 16, pqK = 16)
      val fixedAnn = served(Similarity.annRoute(probes, dir, k = k))
      val fracAnn = served(Similarity.annRoute(probes, dir, k = k,
        probeFraction = frac))
      val fixedPq = served(Similarity.pqRoute(probes, dir, k = k,
        nprobe = 5, rerank = 8))
      val fracPq = served(Similarity.pqRoute(probes, dir, k = k,
        nprobe = 5, rerank = 8, probeFraction = frac))
      info(f"n=$n ann fixed=$fixedAnn%.3f frac=$fracAnn%.3f " +
        f"pq fixed=$fixedPq%.3f frac=$fracPq%.3f")
      assert(fixedAnn == fixedPq && fracAnn == fracPq,
        "both routes serve the same signal off the same stored state")
      assert(fracAnn >= frac,
        f"probeFraction must pin the served fraction (got $fracAnn%.3f)")
      (n, fixedAnn)
    }
    assert(res(1)._2 < res(0)._2,
      f"fixed nprobe against sqrt(N) cells must SHOW the shrinking " +
        f"fraction (got ${res(0)._2}%.3f -> ${res(1)._2}%.3f)")
  }

  test("probeFraction refusals: out of [0,1] refused on both routes") {
    val emb = graft.tools.SynthFixtures.clusteredEmbeddings(spark, 200L)
    val dir = tmp()
    Similarity.ivfWriteIndex(emb, dir, nCells = 8, pqM = 8, pqK = 16)
    val e1 = intercept[IllegalArgumentException] {
      Similarity.annRoute(emb, dir, k = k, probeFraction = 1.5)
    }
    assert(e1.getMessage.contains("probeFraction"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.pqRoute(emb, dir, k = k, probeFraction = -0.1)
    }
    assert(e2.getMessage.contains("probeFraction"))
    val e3 = intercept[IllegalArgumentException] {
      Similarity.pqRoute(emb, dir, k = k, rerankFraction = 1.01)
    }
    assert(e3.getMessage.contains("rerankFraction"))
  }
}

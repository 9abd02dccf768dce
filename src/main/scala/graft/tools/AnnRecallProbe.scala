package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN recall at the served scale (VERDICT r16 ask #2 follow-through):
  * per vector-corpus decade, build the stored IVF (AutoCells sqrt(N)
  * policy) and IVF-PQ indexes and measure mean recall@k on a 500-probe
  * batch vs the exhaustive-probe ground truth, for (a) the FIXED
  * nprobe=5 default — which probes a shrinking fraction of the
  * sqrt(N)-grown cell count, the exact analog of the fixed WAND
  * budget's df decay — and (b) the r17 `probeFraction` knob, which pins
  * the probed-cell fraction (and, measured, recall) at candidates
  * ~ fraction x N per probe.
  *
  * Usage: AnnRecallProbe [outFile] [fraction] [sizes,comma-separated]
  * Writes one JSON record (the ANNRECALL_r17 artifact shape).
  */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("ANNRECALL_r18.json")
    val fraction = args.drop(1).headOption.map(_.toDouble).getOrElse(0.1)
    val sizes = args.drop(2).headOption
      .map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(2000L, 20000L, 200000L))
    val rerankFrac = args.drop(3).headOption.map(_.toDouble).getOrElse(0.1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = 5
    val probes = SynthFixtures.clusteredEmbeddings(spark, 500L, seed = 99L)
      .select((col("vec_id") + 1000000000L).as("vec_id"), col("embedding"))
      .persist()
    probes.count()

    def ids(df: DataFrame): DataFrame =
      df.select(col("qid"), col("nid").as("id"))
    def recallVs(exact: DataFrame, got: DataFrame): Double = {
      val nEx = exact.groupBy("qid").agg(count(lit(1)).as("n_ex"))
      val nHit = exact.join(got, Seq("qid", "id"), "left_semi")
        .groupBy("qid").agg(count(lit(1)).as("n_hit"))
      nEx.join(nHit, Seq("qid"), "left")
        .agg(avg(coalesce(col("n_hit"), lit(0L)).cast("double") /
          col("n_ex"))).collect()(0).getDouble(0)
    }
    def r3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)

    val rows = sizes.map { n =>
      val emb = spark.read.parquet(SynthFixtures.ensureEmbeddings(spark, n))
      val dir = java.nio.file.Files
        .createTempDirectory("graft-annrecall").toString
      graft.operators.Similarity.ivfWriteIndex(emb, dir,
        nCells = graft.operators.Similarity.AutoCells)
      graft.operators.Similarity.ivfWriteIndex(emb, s"$dir-pq",
        nCells = graft.operators.Similarity.AutoCells, pqM = 16, pqK = 16)
      val exact = ids(graft.operators.Similarity.annRoute(probes, dir,
        k = k, nprobe = 1 << 20)).persist()
      exact.count()
      val annFixed = recallVs(exact,
        ids(graft.operators.Similarity.annRoute(probes, dir, k = k)))
      val annFrac = recallVs(exact,
        ids(graft.operators.Similarity.annRoute(probes, dir, k = k,
          probeFraction = fraction)))
      val pqFixed = recallVs(exact,
        ids(graft.operators.Similarity.pqRoute(probes, s"$dir-pq", k = k,
          nprobe = 5, rerank = 8)))
      val pqFrac = recallVs(exact,
        ids(graft.operators.Similarity.pqRoute(probes, s"$dir-pq", k = k,
          nprobe = 5, rerank = 8, probeFraction = fraction)))
      // r18 (the named r17 residual): probeFraction + rerankFraction —
      // BOTH knobs scale with the pool, so the compressed tier's recall
      // is pinned (the fixed rerank*k window truncated a fraction x N
      // candidate pool: 0.589 at 200k, ANNRECALL_r17)
      val pqFracRr = recallVs(exact,
        ids(graft.operators.Similarity.pqRoute(probes, s"$dir-pq", k = k,
          nprobe = 5, rerank = 8, probeFraction = fraction,
          rerankFraction = rerankFrac)))
      exact.unpersist()
      System.err.println(f"[ann-recall] n=$n ann_fixed=$annFixed%.3f " +
        f"ann_frac=$annFrac%.3f pq_fixed=$pqFixed%.3f pq_frac=$pqFrac%.3f " +
        f"pq_frac_rr=$pqFracRr%.3f")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$dir-pq"))
      s""""$n":{"ann_nprobe5":${r3(annFixed)},""" +
        s""""ann_fraction":${r3(annFrac)},"ivfpq_nprobe5":${r3(pqFixed)},""" +
        s""""ivfpq_fraction":${r3(pqFrac)},""" +
        s""""ivfpq_fraction_rerank":${r3(pqFracRr)}}"""
    }
    val json =
      s"""{"note":"mean recall@$k vs exhaustive-probe ground truth, 500 clustered probes, stored IVF/IVF-PQ at AutoCells=sqrt(N); nprobe5 = the fixed default (probed fraction shrinks as cells grow sqrt(N) — the WAND-budget decay analog), fraction = probeFraction=$fraction (nprobe_eff = max(5, ceil(cells x fraction)) — probed fraction pinned, candidates ~ fraction x N per probe: the honest cost of pinned recall for exhaustive-in-cell scoring); fraction_rerank (r18) additionally sets rerankFraction=$rerankFrac — the exact-rerank window scales as max(rerank x k, ceil(rerankFraction x the query's own ADC pool)) instead of the fixed rerank x k that truncated the fraction x N pool (the r17 ivfpq residual: 0.589 at 200k) — BOTH compressed-tier knobs now serve fractions, not constants","k":$k,"probe_fraction":$fraction,"rerank_fraction":$rerankFrac,"recall_by_size":{${rows.mkString(",")}}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}

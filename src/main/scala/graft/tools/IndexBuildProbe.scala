package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Time the BM25 index BUILD/APPEND staging paths in isolation (the
  * bench cold pass' dominant cost): IndexBuildProbe [sfDir] [reps].
  * Builds a ws index (forward + fraction impacts — the superset of
  * stage tables) over the even-id half of documents, then appends the
  * odd half, `reps` times each into fresh dirs. Prints per-rep seconds.
  */
object IndexBuildProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val docs = graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    for (r <- 1 to reps) {
      val base = java.nio.file.Files
        .createTempDirectory("bm25-probe").toString
      val t0 = System.nanoTime()
      graft.operators.TextIndex.writeBm25Index(even, base,
        forward = true, impactFraction = 0.2)
      val t1 = System.nanoTime()
      graft.operators.TextIndex.appendBm25Index(odd, base)
      val t2 = System.nanoTime()
      println(f"rep$r build ${(t1 - t0) / 1e9}%6.2fs  append ${(t2 - t1) / 1e9}%6.2fs")
      graft.sources.IndexCommit.deleteTree(java.nio.file.Paths.get(base))
    }
    spark.stop()
  }
}

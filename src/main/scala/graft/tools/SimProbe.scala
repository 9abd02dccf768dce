package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: brute-vs-ANN wall clock at different probe-batch sizes. */
object SimProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.t(spark, "/root/testdata/sf0.1", "embeddings")
    emb.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    for (m <- Seq(100, 5)) {
      val probe = col("vec_id") % m === 0
      graft.Caches.clear()
      time(s"brute  %$m")(println(
        graft.operators.Similarity.bruteForceTopK(emb, probe, 5).count()))
      time(s"annLsh %$m cold")(println(
        graft.operators.Similarity.annLsh(emb, probe, 5).count()))
      time(s"annLsh %$m warm")(println(
        graft.operators.Similarity.annLsh(emb, probe, 5).count()))
      time(s"ivf    %$m cold")(println(
        graft.operators.Similarity.ivfTopK(emb, probe, 5).count()))
    }
    spark.stop()
  }
}

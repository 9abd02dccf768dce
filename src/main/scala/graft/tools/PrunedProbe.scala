package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextIndex

/** Scratch probe for the certificate-driven pruned BM25 serve: builds
  * forward-enabled indexes over the driver testdata (degenerate 31-word
  * vocabulary — expected to ESCALATE) and a Zipf synth corpus (df-skewed
  * — expected to certify round 1), and checks pruned == full on both.
  */
object PrunedProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .appName("pruned-probe").getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOGLEVEL", "WARN"))
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")

    val rounds = scala.collection.mutable.ArrayBuffer.empty[String]
    graft.sources.IndexCommit.failpoint =
      n => if (n.startsWith("bm25-pruned-")) rounds += n

    // ---- degenerate-vocabulary testdata ----
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("pruned-probe").toString
    TextIndex.writeBm25Index(docs, dir, forward = true)
    val terms = Seq("spark", "merge", "vector")
    val full = TextIndex.bm25TopK(spark, dir, terms).collect().toSeq
    rounds.clear()
    val pruned = TextIndex.bm25TopKPruned(spark, dir, terms).collect().toSeq
    println(s"[probe] testdata rounds=${rounds.filter(_.contains("round")).size} " +
      s"equal=${full == pruned}")
    if (full != pruned) {
      println("FULL:   " + full.take(5).mkString(" | "))
      println("PRUNED: " + pruned.take(5).mkString(" | "))
    }

    // ---- Zipf synth corpus: one rare + one mid + one common term ----
    val zdocs = SynthFixtures.zipfDocs(spark, 20000L)
    val zdir = java.nio.file.Files.createTempDirectory("pruned-zipf").toString
    TextIndex.writeBm25Index(zdocs, zdir, forward = true)
    // term df profile: w000005 (head, huge df), w000500 (mid), w020123 (tail)
    val zterms = Seq("w000005", "w000500", "w020123")
    val dfs = spark.read.parquet(s"$zdir/postings")
      .filter(col("term").isin(zterms: _*))
      .groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    println(s"[probe] zipf dfs=$dfs")
    val zfull = TextIndex.bm25TopK(spark, zdir, zterms, k = 10).collect().toSeq
    rounds.clear()
    val zpruned = TextIndex.bm25TopKPruned(spark, zdir, zterms, k = 10)
      .collect().toSeq
    val zrounds = rounds.filter(_.contains("round")).size
    val zbuckets = rounds.filter(_.contains("buckets"))
    println(s"[probe] zipf rounds=$zrounds equal=${zfull == zpruned} " +
      s"buckets=${zbuckets.mkString(" ; ")}")
    if (zfull != zpruned) {
      println("FULL:   " + zfull.take(5).mkString(" | "))
      println("PRUNED: " + zpruned.take(5).mkString(" | "))
    }

    // ---- route parity on a small Zipf query batch ----
    val queries = SynthFixtures.zipfQueries(spark, 30L)
    val viaFull = TextIndex.bm25Route(queries, zdir, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    rounds.clear()
    val viaPruned = TextIndex.bm25RoutePruned(queries, zdir, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    println(s"[probe] route rounds=${rounds.filter(_.contains("round")).size} " +
      s"equal=${viaFull == viaPruned} n=${viaFull.size}")

    // ---- timed batch at RouteBench scale: full vs pruned ----
    val nBig = args.drop(1).headOption.map(_.toLong).getOrElse(50000L)
    val nQ = args.drop(2).headOption.map(_.toLong).getOrElse(2500L)
    val bdocs = spark.read.parquet(SynthFixtures.ensureZipfDocs(spark, nBig))
    val bdir = java.nio.file.Files.createTempDirectory("pruned-big").toString
    TextIndex.writeBm25Index(bdocs, bdir, nBuckets = 64, forward = true)
    val bq = SynthFixtures.zipfQueries(spark, nQ).persist()
    bq.count()
    def time(f: () => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def bigFull(): Long = TextIndex.bm25Route(bq, bdir, k = 10).count()
    def bigPruned(): Long = TextIndex.bm25RoutePruned(bq, bdir, k = 10).count()
    bigFull(); bigPruned() // warm
    val fT = (1 to 3).map(_ => time(bigFull _)).map(_._1).min
    rounds.clear()
    val pT = (1 to 3).map(_ => time(bigPruned _)).map(_._1).min
    val nR = rounds.count(_.contains("round")) / 3
    println(f"[probe] big n=$nBig q=$nQ full=${fT}%.2fs " +
      f"pruned=${pT}%.2fs (~$nR rounds/pass) ratio=${fT / pT}%.2fx")
    spark.stop()
  }
}

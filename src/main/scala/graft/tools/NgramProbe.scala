package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the exact n-gram Jaccard pipeline at sf0.1. */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = graft.Tables.t(spark, dir, "documents")
    // the benchmarked operator's own constants — a drift here would make
    // the probe time a different pipeline than the one it attributes
    val threshold = 0.6
    val cut = graft.operators.Dedup.maxBucketSize

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }

    time("warmup scan")(docs.count())
    val sh = graft.operators.Dedup.shingles(docs, 3)
    time("shingles explode")(println(sh.count()))
    val df = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= cut)
    time("df agg + cut")(println(df.count()))
    val kept = sh.join(df, "shingle")
    time("kept join")(println(kept.count()))
    val sizes = kept.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("id")).orderBy(col("df"), col("shingle"))
    val pre = kept.join(sizes, "id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <=
        floor(lit(1.0 - threshold) * col("n") + lit(1e-9)) + 1)
      .select(col("id"), col("n"), col("rn"), col("shingle"))
    time("prefix window")(println(pre.count()))
    time("full query (cold caches)")(println(
      graft.operators.Dedup.ngramJaccardPairs(docs, 3, 0.6).count()))
    // the public entry caches its OUTPUT, so re-time the uncached body —
    // this is the warm-pipeline (candidate-gen + verify) cost the probe
    // exists to attribute; the public re-call would just reread the cache
    val realKey =
      s"${docs.queryExecution.analyzed.semanticHash()}|k=3|t=$threshold"
    time("pipeline re-run (warm idx)")(println(
      graft.operators.Dedup.ngramJaccardPairsUncached(docs, 3, threshold,
        realKey).count()))
    spark.stop()
  }
}
// appended fine-grained warm-stage probe
object NgramProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = graft.Tables.t(spark, dir, "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    // build all caches first
    time("full query (build caches)")(println(
      graft.operators.Dedup.ngramJaccardPairs(docs, 3, 0.6).count()))
    val t = 0.6
    val sh = graft.operators.Dedup.keptShingles(docs, 3)
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("id")).orderBy(col("df"), col("shingle"))
    val pre = graft.Caches.cached("dedup-prefix",
      s"${docs.queryExecution.analyzed.semanticHash()}|k=3|t=$t") {
      sh.join(sizes, "id")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= floor(lit(1.0 - t) * col("n") + lit(1e-9)) + 1)
        .select(col("id"), col("n"), col("rn"), col("shingle"))
    }
    time("pre count (cached)")(println(pre.count()))
    val idx = pre.filter(col("rn") <=
      floor(lit((1.0 - t) / (1.0 + t)) * col("n") + lit(1e-9)) + 1)
    val needed = lit(t / (1.0 + t)) * (col("x.n") + col("y.n")) - lit(1e-9)
    val cand = idx.as("x").join(pre.as("y"),
        col("x.shingle") === col("y.shingle") &&
          (col("x.n") < col("y.n") ||
            (col("x.n") === col("y.n") && col("x.id") < col("y.id"))) &&
          col("x.n") >= lit(t) * col("y.n") - lit(1e-9) &&
          lit(1) + least(col("x.n") - col("x.rn"), col("y.n") - col("y.rn"))
            >= needed)
      .select(least(col("x.id"), col("y.id")).as("da"),
        greatest(col("x.id"), col("y.id")).as("db"))
    time("candidate join raw")(println(cand.count()))
    val candD = cand.distinct()
    time("candidate distinct")(println(candD.count()))
    val candC = candD.cache()
    candC.count()
    val inter = candC
      .join(sh.select(col("id").as("da"), col("shingle")), "da")
      .join(sh.select(col("id").as("db"), col("shingle")), Seq("db", "shingle"))
      .groupBy("da", "db").agg(count(lit(1)).as("inter"))
    time("verify inter")(println(inter.count()))
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
object FpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def planHash(df: org.apache.spark.sql.DataFrame): String = {
      val s = df.queryExecution.optimizedPlan.canonicalized.toString
        .replaceAll("#\\d+L?", "#")
        .replaceAll("\\$\\$?Lambda\\$?\\d*/0x[0-9a-fA-F]+", "\\$\\$Lambda")
        .replaceAll("@[0-9a-fA-F]+", "@")
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    }
    for (n <- Seq("dedup_minhash_lsh", "dedup_ngram_jaccard", "sim_ann_lsh",
        "q_asof_join", "text_contaminate", "mm_resize", "pipe_classify",
        "q_distinct_agg", "sim_topk")) {
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      println(s"FP $n ${planHash(df)}")
    }
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
object FpDump {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def norm(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.optimizedPlan.canonicalized.toString
        .replaceAll("#\\d+L?", "#")
        .replaceAll("\\$\\$?Lambda\\$?\\d*/0x[0-9a-fA-F]+", "\\$\\$Lambda")
        .replaceAll("@[0-9a-fA-F]+", "@")
    // warm the shared caches the way the bench does (pinned-first query)
    graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, sfDir).count()
    val n = args(0)
    val df = graft.SparkEntry.queries(n)(spark, sfDir)
    java.nio.file.Files.write(java.nio.file.Paths.get(args(1)),
      norm(df).getBytes("UTF-8"))
    spark.stop()
  }
}

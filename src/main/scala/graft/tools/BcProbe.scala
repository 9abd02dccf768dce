package graft.tools
import org.apache.spark.sql.SparkSession
object BcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- Seq("curate_line_dedup", "curate_substring_dedup")) {
      val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
      df.count()
      val p = df.queryExecution.executedPlan.toString
      val bhj = p.split("\n").count(_.contains("BroadcastHashJoin"))
      val smj = p.split("\n").count(_.contains("SortMergeJoin"))
      println(s"BC $n bhj=$bhj smj=$smj")
    }
    spark.stop()
  }
}

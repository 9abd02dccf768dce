package graft.tools
import org.apache.spark.sql.SparkSession
object FnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fns = spark.sql("SHOW FUNCTIONS").collect().map(_.getString(0))
    println("THETA: " + fns.filter(_.contains("theta")).mkString(","))
    println("HLL: " + fns.filter(_.contains("hll")).mkString(","))
    println("KLL: " + fns.filter(_.contains("kll")).mkString(","))
    spark.stop()
  }
}

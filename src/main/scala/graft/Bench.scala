package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // n>=2 passes over the whole query set: this box's wall-clock variance
    // is +-40% run to run (page-cache/GC aberrations), so a single pass
    // can't distinguish a regression from sandbox noise. `queries`/`value`
    // stay the FIRST pass (directly comparable to the single-run records
    // of earlier rounds); queries2/value2 expose the repeat so a reader
    // can bound the noise per query.
    // a failing query must be VISIBLE in the record, not silently timed as
    // its (usually fast) time-to-failure: failures land in an "errors" key
    // and contribute NO timing at all, so `value` stays a sum of real runs
    // (a deflated total would read as a speedup across rounds)
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    def onePass(): Map[String, Double] = SparkEntry.queries.flatMap {
      case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          Some(name -> (System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          failed += name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          None
        }
    }
    val passes = (1 to math.max(1, runs)).map(_ => onePass())
    def fmt(m: Map[String, Double]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val extra =
      if (passes.size < 2) ""
      else passes.tail.zipWithIndex.map { case (p, i) =>
        s""","queries${i + 2}":${fmt(p)},"value${i + 2}":${p.values.sum}"""
      }.mkString
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = passes.head.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${fmt(passes.head)},"runs":${passes.size}$extra,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

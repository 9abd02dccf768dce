package graft
import org.apache.spark.sql.SparkSession
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * CONTRACT FILE (SURVEY.md §7): the driver invokes `main(sfDir, outDir)`
  * and reads `outDir/<name>.parquet` + `outDir/oracle_sql.json`. Changes
  * must stay drop-in compatible with that call shape. The optional
  * trailing query-name filter below is additive only — zero extra args
  * (the driver's invocation) still dumps the full set. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (Array(sfDir, outDir), onlyArgs) = args.splitAt(2)
    // optional trailing query names: dump only those (local iteration on a
    // single oracle; the driver always runs the full set)
    val only = onlyArgs.toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    OracleJson.write(outDir)
    spark.stop()
  }
}

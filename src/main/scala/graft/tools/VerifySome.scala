package graft.tools

import org.apache.spark.sql.SparkSession

/** Local subset of [[graft.Verify]]: dump only the named queries (all of
  * them when none given) + the full oracle_sql.json, for quick iteration
  * with tools/check_oracle.py. Usage: VerifySome <sfDir> <outDir> [name...]
  */
object VerifySome {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val names = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    graft.SparkEntry.queries
      .filter { case (n, _) => names.isEmpty || names(n) }
      .foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        println(f"[verifysome] $name ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      }
    graft.OracleJson.write(outDir)
    spark.stop()
  }
}

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
    // Per-query PLAN FINGERPRINT: an 8-hex md5 of the canonicalized optimized
    // logical plan (expr ids normalized by canonicalization; residual ids and
    // object hashes stripped). A fingerprint that matches last round's proves a
    // wall-time delta is box noise, not a plan change — the attribution tool
    // VERDICT r6 asked for. Computed during pass 1 on the already-built
    // DataFrame, so the only added cost is rendering a plan string (~ms) that
    // count() was about to optimize anyway.
    val planHashes = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def planHash(df: org.apache.spark.sql.DataFrame): String = {
      val s = df.queryExecution.optimizedPlan.canonicalized.toString
        .replaceAll("#\\d+L?", "#")
        // lambda class ids (Fn$$Lambda$123/0x7f...) vary with classload
        // order, i.e. per JVM — normalize or typed-API plans never match
        .replaceAll("\\$\\$?Lambda\\$?\\d*/0x[0-9a-fA-F]+", "\\$\\$Lambda")
        .replaceAll("@[0-9a-fA-F]+", "@")
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    }
    def onePass(collectPlans: Boolean): Map[String, Double] = SparkEntry.queries.flatMap {
      case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          if (collectPlans) planHashes(name) = planHash(df)
          df.count()
          Some(name -> (System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          failed += name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          None
        }
    }
    val passes = (1 to math.max(1, runs)).zipWithIndex.map { case (_, i) => onePass(collectPlans = i == 0) }
    // the harness records only a bounded TAIL of stdout, so the record must
    // be (a) short — ms-precision times, not 17-digit doubles — and (b)
    // redundant: all pass totals appear BOTH at the head of the line (the
    // natural parse) and again in a tiny `totals` key at the very end, so
    // even a front-truncated capture still carries every total
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def fmt(m: Map[String, Double]): String =
      m.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val totals = passes.map(_.values.sum)
    val headTotals = totals.zipWithIndex.map { case (t, i) =>
      val key = if (i == 0) "value" else s"value${i + 1}"
      s""""$key":${r3(t)}"""
    }.mkString(",")
    val queryMaps = passes.zipWithIndex.map { case (p, i) =>
      val key = if (i == 0) "queries" else s"queries${i + 1}"
      s""""$key":${fmt(p)}"""
    }.mkString(",")
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val tailTotals = totals.map(r3).mkString("[", ",", "]")
    val plans = planHashes.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }.mkString("{", ",", "}")
    println(s"""{"metric":"total",$headTotals,"unit":"sec","runs":${passes.size},"errors":$errs,"sf":"$sfDir",$queryMaps,"plans":$plans,"totals":$tailTotals}""")
    // The full record above is ONE ~5-7 KB line; the harness keeps only a
    // bounded TAIL of stdout, so its head (pass-1 totals + early per-query
    // times) can be truncated away, leaving no complete JSON object in the
    // capture (BENCH_r06 "parsed": null). This trailing standalone line is
    // <=200 bytes and carries every total, so the capture always ENDS with
    // one complete, machine-parseable JSON object. Printed AFTER
    // spark.stop() so no shutdown-time log line can land below it.
    spark.stop()
    println(s"""{"metric":"total",$headTotals,"unit":"sec","runs":${passes.size},"nq":${SparkEntry.queries.size},"errors":$errs,"totals":$tailTotals}""")
  }
}

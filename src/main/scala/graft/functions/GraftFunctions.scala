package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}

/** SQL registration for the graft-native expressions, so `spark.sql` users
  * get them alongside the DataFrame API:
  *
  * {{{
  *   GraftFunctions.register(spark)
  *   spark.sql("SELECT rolling_hash(text), simhash64(split(text, ' ')) FROM docs")
  * }}}
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[ClassicSession].sessionState.functionRegistry
    registry.createOrReplaceTempFunction("gunzip", es => Gunzip(es.head), "scala_udf")
    registry.createOrReplaceTempFunction("gzip", es => Gzip(es.head), "scala_udf")
    registry.createOrReplaceTempFunction("simhash64", es => SimHash64(es.head), "scala_udf")
    registry.createOrReplaceTempFunction("rolling_hash", es => RollingHash(es.head), "scala_udf")
    registry.createOrReplaceTempFunction("nfc_normalize", es => NfcNormalize(es.head), "scala_udf")
    registry.createOrReplaceTempFunction("dot_product", es => DotProduct(es(0), es(1)), "scala_udf")
    registry.createOrReplaceTempFunction("sorted_intersect_count", es => SortedIntersectCount(es(0), es(1)), "scala_udf")
    registry.createOrReplaceTempFunction("zorder2", es => ZOrder2(es(0), es(1)), "scala_udf")
    registry.createOrReplaceTempFunction("sorted_min_gap", es => SortedMinGap(es(0), es(1)), "scala_udf")
    // typed Aggregator UDAFs register through the udf facade, not the
    // expression registry
    spark.udf.register("heavy_hitters",
      org.apache.spark.sql.functions.udaf(new MisraGriesAggregator(1024)))
  }
}

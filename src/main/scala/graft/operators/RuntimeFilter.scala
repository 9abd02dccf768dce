package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter runtime filtering — the semi-join reduction Spark's own
  * `InjectRuntimeFilter` rule applies automatically between shuffle-join
  * sides, exposed as an explicit operator for pipelines that want to place
  * it themselves (pre-filter a fact table against a dim subset BEFORE the
  * fact side pays its exchange).
  *
  * Built on Spark's native `BloomFilterAggregate` / `BloomFilterMightContain`
  * expressions (the same pair the optimizer injects), not a reimplementation:
  * the build side aggregates xxhash64(key) into a mergeable bloom sketch
  * (partial per partition, merged once), and the probe side evaluates a
  * codegen'd might_contain against the serialized filter literal.
  *
  * Scale story: at 100 TB the payoff is the FACT-side exchange. A dim too
  * big to broadcast forces a shuffle join; the bloom costs one dim-side agg
  * (a few MB of mergeable state, the only bytes that reach the driver) and
  * then removes the vast majority of non-matching fact rows in the narrow
  * pre-exchange scan — rows that would otherwise be shuffled only to be
  * dropped by the join. False positives (~1% at the default sizing) are
  * removed by the join itself, so the transform is semantics-preserving —
  * which is exactly why the DuckDB oracle for [[graft.queries.JoinQueries]]'
  * `q_bloom_join` is the PLAIN join: the bloom must be invisible in results.
  */
object RuntimeFilter {

  /** Aggregate `key` of `build` into a serialized bloom filter (driver-held
    * bytes, like Spark's own runtime-filter subquery result). Distributed
    * build: partial sketches merge map-side; only the merged filter moves.
    */
  def buildBloom(build: DataFrame, key: Column,
                 expectedItems: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      Bridge.expression(xxhash64(key)), expectedItems)
      .toAggregateExpression()
    build.select(Bridge.column(agg).as("bloom"))
      .head().getAs[Array[Byte]](0)
  }

  /** Codegen'd membership probe against a built filter. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      Bridge.expression(xxhash64(key))))

  /** `fact` pre-filtered to rows whose `factKey` might match `buildKey` of
    * `build` — the explicit runtime-filter step. Callers still join
    * afterwards (the bloom admits ~1% false positives by design).
    */
  def bloomFiltered(fact: DataFrame, factKey: Column, build: DataFrame,
                    buildKey: Column, expectedItems: Long): DataFrame =
    fact.filter(mightContain(buildBloom(build, buildKey, expectedItems),
      factKey))
}

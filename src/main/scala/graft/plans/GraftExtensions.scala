package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile, Count, HyperLogLogPlusPlus, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

import graft.functions.{DotProduct, Gunzip, Gzip, RollingHash, SimHash64, SortedIntersectCount}

/** Opt-in query-acceleration rewrite: `count(DISTINCT x)` → the
  * HyperLogLog++ sketch (`approx_count_distinct`), enabled per session by
  * `spark.graft.approxDistinct.enabled=true` (default false — the rewrite
  * trades exactness for speed, so it must be an explicit choice).
  *
  * Why this is an engine feature and not a query edit: an exact distinct
  * count over a high-cardinality key is one of the few aggregations with no
  * bounded-memory partial form — Spark plans it as a two-phase
  * Expand/shuffle-on-the-key, which at 100 TB means a full re-shuffle of
  * every distinct value. The sketch form is a constant-size buffer with
  * map-side combine: one narrow pass, one tiny exchange. Flipping the flag
  * turns every dashboard-style distinct count in an existing workload into
  * the sketch plan without touching query text.
  *
  * Only single-argument `count(DISTINCT x)` rewrites; multi-argument
  * distinct counts and other distinct aggregates (e.g. `sum(DISTINCT …)`)
  * keep exact semantics. Result type is unchanged (both are LONG).
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {
  val flagKey = "spark.graft.approxDistinct.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(flagKey, "false").toBoolean) plan
    else plan.transform {
      case a: Aggregate => a.transformExpressions {
        case ae @ AggregateExpression(c: Count, _, true, _, _)
            if c.children.size == 1 =>
          ae.copy(aggregateFunction = HyperLogLogPlusPlus(c.children.head),
            isDistinct = false)
      }
    }
}

/** Opt-in quantile acceleration: exact `percentile(x, p)` → the
  * Greenwald–Khanna sketch (`approx_percentile`), enabled per session by
  * `spark.graft.approxPercentile.enabled=true` (default false), accuracy
  * from `spark.graft.approxPercentile.accuracy` (default 10000 — rank
  * error ≤ n/accuracy, the built-in default).
  *
  * Why this is the 100 TB quantile story: exact `percentile` materializes
  * EVERY value of the group into its aggregation buffer (an unbounded
  * OpenHashMap partial state) — at 5×10^10 rows that is the dataset in
  * executor heaps. The GK sketch is a bounded-size mergeable summary with
  * true map-side combine: memory O(accuracy·log n) per group regardless of
  * group size. Flipping the flag moves an existing workload's quantile
  * dashboards onto the sketch without touching query text.
  *
  * Rewrites only the schema-preserving case: non-DISTINCT, forward (not
  * `reverse`), unit frequency, DOUBLE-typed input — exact `percentile`
  * interpolates to DOUBLE while the sketch returns an observed value of
  * the INPUT type, so for a DOUBLE column (and only then) the output type
  * is unchanged and the optimizer-time swap is sound. Everything else
  * keeps exact semantics.
  */
object ApproxPercentileRewrite extends Rule[LogicalPlan] {
  val flagKey = "spark.graft.approxPercentile.enabled"
  val accuracyKey = "spark.graft.approxPercentile.accuracy"

  private def unitFrequency(e: Expression): Boolean = e match {
    case Literal(v: Long, LongType)    => v == 1L
    case Literal(v: Integer, IntegerType) => v == 1
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(flagKey, "false").toBoolean) plan
    else {
      val acc = conf.getConfString(accuracyKey, "10000").toInt
      plan.transform {
        case a: Aggregate => a.transformExpressions {
          case ae @ AggregateExpression(p: Percentile, _, false, _, _)
              if !p.reverse && p.child.dataType == DoubleType &&
                unitFrequency(p.frequencyExpression) =>
            ae.copy(aggregateFunction = new ApproximatePercentile(
              p.child, p.percentageExpression, Literal(acc)))
        }
      }
    }
}

/** The engine's [[SparkSessionExtensions]] entry point — the standard
  * mechanism for shipping Catalyst extensions with a library (set
  * `spark.sql.extensions=graft.plans.GraftExtensions`, or pass to
  * `SparkSession.builder().withExtensions(...)`):
  *
  *  - registers every graft-native expression as a session-isolated SQL
  *    function (catalog-backed — unlike temp-function registration, each
  *    session built with the extension gets them without mutating shared
  *    state; [[graft.functions.GraftFunctions.register]] remains for
  *    attaching to an already-built session);
  *  - injects [[ApproxDistinctRewrite]] into the optimizer (inert until
  *    its flag is set).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, arity: Int, usage: String)
                (builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft", null, name, usage, ""),
      (es: Seq[Expression]) => {
        // arity-checked like every built-in: a wrong argument count must be
        // an analysis-time error, not a NoSuchElementException from the
        // builder
        if (es.size != arity) throw new IllegalArgumentException(
          s"$name expects $arity argument(s), got ${es.size}")
        builder(es)
      })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("gunzip", 1,
      "gunzip(bytes) - gzip-decompress a binary column (returns the decompressed bytes; CAST AS STRING for text)") {
      es => Gunzip(es.head) })
    ext.injectFunction(fn("gzip", 1,
      "gzip(bytes) - gzip-compress a binary column (strings implicit-cast)") {
      es => Gzip(es.head) })
    ext.injectFunction(fn("simhash64", 1,
      "simhash64(tokens) - 64-bit SimHash of a token array") {
      es => SimHash64(es.head) })
    ext.injectFunction(fn("rolling_hash", 1,
      "rolling_hash(str) - polynomial rolling hash fingerprint") {
      es => RollingHash(es.head) })
    ext.injectFunction(fn("dot_product", 2,
      "dot_product(a, b) - sequential-accumulation double dot product") {
      es => DotProduct(es(0), es(1)) })
    ext.injectFunction(fn("sorted_intersect_count", 2,
      "sorted_intersect_count(a, b) - intersection size of two sorted string arrays (linear merge)") {
      es => SortedIntersectCount(es(0), es(1)) })
    ext.injectOptimizerRule(_ => ApproxDistinctRewrite)
    ext.injectOptimizerRule(_ => ApproxPercentileRewrite)
    ext.injectPlannerStrategy(_ => TopKPerGroupStrategy)
  }
}

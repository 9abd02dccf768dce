package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the dbt-test / Deequ-style
  * validation pass a pipeline runs before trusting (or publishing) a drop:
  * each rule is a named per-row predicate, and one aggregation pass reports
  * rows checked / violations per rule.
  *
  * Scale: ALL row-level rules evaluate in a single narrow projection over
  * one scan — N rules cost N codegen'd boolean columns, not N passes — and
  * the report aggregate returns one row per rule (conditional counts, no
  * shuffle beyond the single global agg). Cross-table rules (referential
  * integrity) are the standard anti-join count, broadcast when the
  * dimension side is small. Nothing row-sized leaves the executors.
  */
object Expectations {

  /** A named row-level expectation: `pred` is true for conforming rows. */
  case class Rule(name: String, pred: Column)

  /** Evaluate every rule in one pass: returns (rule, n_rows, n_violations,
    * violation_rate) — long/double, one row per rule, rule-name ordered.
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty)
    val agg = df.agg(
      count(lit(1)).as("n_rows"),
      rules.map(r => count(when(!coalesce(r.pred, lit(false)), 1))
        .as(s"v_${r.name}")): _*)
    val rows = rules.map(r => struct(lit(r.name).as("rule"),
      col("n_rows"), col(s"v_${r.name}").as("n_violations"),
      (col(s"v_${r.name}").cast("double") / col("n_rows"))
        .as("violation_rate")))
    agg.select(explode(array(rows: _*)).as("e")).select("e.*")
      .orderBy("rule")
  }

  /** Referential-integrity expectation: count child rows whose `childKey`
    * has no match in `parent`'s `parentKey` (orphans). One row out; the
    * anti-join broadcasts the parent key set when small enough, else
    * shuffles on the key like any join.
    */
  def orphans(child: DataFrame, childKey: String, parent: DataFrame,
              parentKey: String, rule: String): DataFrame = {
    val n = child.count()
    child.join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(rule).as("rule"), lit(n).as("n_rows"),
        col("n_violations"),
        (col("n_violations").cast("double") / n).as("violation_rate"))
  }
}

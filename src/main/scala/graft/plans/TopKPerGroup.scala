package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

/** Grouped top-k as a first-class operator: the k best rows per group under
  * an explicit total order, planned as [[TopKPerGroupExec]].
  *
  * Why a custom operator (SURVEY.md §2 "custom operators" ladder, tier c —
  * whole-operator semantics the built-ins can't express efficiently): the
  * DataFrame idiom `row_number().over(Window.partitionBy(g).orderBy(o))
  * .filter(rn <= k)` plans as Exchange -> FULL SORT of every partition ->
  * Window -> Filter. The sort materializes and orders ALL rows of every
  * group only to discard all but k: at 100 TB that is the single largest
  * avoidable cost in every "top-k neighbors / top-k errors per function /
  * top-k terms per doc" query. This operator keeps one bounded heap per
  * group per partition — O(groups x k) memory, no sort, no spill — after
  * the same clustering exchange the window plan needs (the exchange is
  * demanded via requiredChildDistribution, so Catalyst/AQE place and reuse
  * it like any other).
  *
  * Spark's own TakeOrderedAndProject does exactly this for GLOBAL top-k;
  * this is the per-group generalization.
  */
object TopKPerGroup {

  /** The k best rows of `df` per `groupCols` group under `orderKeys`
    * ((column, ascending) pairs; the FIRST sort key wins, ties fall to the
    * later keys — callers give a TOTAL order for deterministic output, the
    * same contract as every presentation sort in this engine). Output
    * schema = input schema.
    *
    * Columns are resolved by name against the analyzed child — the node is
    * built fully resolved, so it flows through optimization as a plain
    * barrier (no custom analysis rule needed).
    */
  def apply(df: DataFrame, groupCols: Seq[String],
            orderKeys: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k > 0)
    val spark = df.sparkSession
    // attach the strategy to whatever session the caller holds; sessions
    // built with GraftExtensions already have it injected
    Bridge.ensureStrategy(spark, TopKPerGroupStrategy)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.filter(_.name == name) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"no column '$name' in ${analyzed.output.map(_.name).mkString(", ")}")
        case _ => throw new IllegalArgumentException(
          // same contract as an ambiguous col() reference — never silently
          // bind the first of two same-named join outputs
          s"ambiguous column '$name': multiple attributes match")
      }
    val order = orderKeys.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    Bridge.ofRows(spark,
      TopKPerGroupNode(groupCols.map(attr), order, k, analyzed))
  }
}

/** Logical node: an analysis/optimizer barrier with the child's schema.
  * groupExprs/order resolve through the standard generic resolution pass.
  */
case class TopKPerGroupNode(groupExprs: Seq[Expression],
                            order: Seq[SortOrder], k: Int,
                            child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroupNode =
    copy(child = c)
}

/** Plans [[TopKPerGroupNode]] onto [[TopKPerGroupExec]]. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Physical grouped top-k: one bounded binary heap per group per partition.
  *
  * Requires clustering on the group key (EnsureRequirements inserts the
  * hash exchange — or elides it when the child is already co-partitioned,
  * e.g. bucketed input) but NO child ordering: that is the point — rows
  * stream through once, each compared against its group's current k-th
  * best in O(log k).
  */
case class TopKPerGroupExec(groupExprs: Seq[Expression],
                            order: Seq[SortOrder], k: Int,
                            child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val boundOrder = order
    val childOutput = child.output
    val groupE = groupExprs
    val limit = k
    child.execute().mapPartitions({ iter =>
      // codegen'd comparator over the declared sort order
      val ordering = RowOrdering.create(boundOrder, childOutput)
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      // PriorityQueue dequeues the MAX under `ordering` = the worst kept
      // row; LinkedHashMap keeps first-seen group order (deterministic
      // within the partitioning, like any hash aggregate's output)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow,
        mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row) // reused buffer: copy only on first sight
        val heap = heaps.getOrElse(key, {
          val h = mutable.PriorityQueue.empty[InternalRow](ordering)
          heaps.put(key.copy(), h)
          h
        })
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      // emit each group's survivors in sort order (dequeue = worst-first)
      heaps.iterator.flatMap { case (_, h) =>
        h.dequeueAll.reverseIterator
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

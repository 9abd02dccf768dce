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
  * group per partition after the same clustering exchange the window plan
  * needs (the exchange is demanded via requiredChildDistribution, so
  * Catalyst/AQE place and reuse it like any other).
  *
  * Memory contract (heap mode, the default): O(groups-per-partition x k)
  * row copies on the JVM heap, OUTSIDE Spark's task memory manager — no
  * sort, no spill. That is the right trade when groups-per-partition x k
  * rows fit in task memory (probe batches, per-function error buckets,
  * per-stratum quotas). It is the WRONG trade for very-high-cardinality
  * group keys (e.g. top-k per order over billions of orders): there, set
  * `spark.graft.topk.sortBased=true` and the operator instead demands a
  * child sort on (group, order) and streams first-k-per-group in O(1)
  * state — the sort is Spark's own spill-safe SortExec, so memory stays
  * bounded at any cardinality (the window plan's safety, minus the window).
  * Heap mode additionally fail-fasts with a clear message when a partition
  * exceeds `spark.graft.topk.maxHeapGroups` distinct groups (default 4M)
  * instead of dying with an opaque executor OOM.
  *
  * Spark's own TakeOrderedAndProject does exactly this for GLOBAL top-k;
  * this is the per-group generalization.
  */
object TopKPerGroup {

  val sortBasedKey = "spark.graft.topk.sortBased"
  val maxHeapGroupsKey = "spark.graft.topk.maxHeapGroups"

  /** The k best rows of `df` per `groupCols` group under `orderKeys`
    * ((column, ascending) pairs). Output schema = input schema.
    *
    * `orderKeys` MUST form a TOTAL order within each group — end with a
    * unique key (an id), like every presentation sort in this engine. Under
    * ties at the k-th position the kept rows are otherwise unspecified and
    * may differ from the `row_number` window plan (which itself keeps an
    * arbitrary k among ties); there is no runtime guard, the contract lives
    * here at the call boundary.
    *
    * Columns are resolved by name against the analyzed child using the
    * session's resolver (case-insensitive under the default
    * `spark.sql.caseSensitive=false`, like `col()`); the node is built
    * fully resolved, so it flows through optimization as a plain barrier
    * (no custom analysis rule needed).
    */
  def apply(df: DataFrame, groupCols: Seq[String],
            orderKeys: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k > 0)
    val spark = df.sparkSession
    // attach the strategy to whatever session the caller holds; sessions
    // built with GraftExtensions already have it injected
    Bridge.ensureStrategy(spark, TopKPerGroupStrategy)
    val analyzed = df.queryExecution.analyzed
    val resolve = Bridge.resolver(spark)
    def attr(name: String): Attribute =
      analyzed.output.filter(a => resolve(a.name, name)) match {
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
    // sortBased = None: the execution mode is resolved from
    // `spark.graft.topk.sortBased` at PLANNING time (in the strategy), so
    // like any other spark.* runtime conf it can be set after the frame is
    // built and still take effect — baking it in here would silently
    // ignore later conf changes. Pass Some(_) to pin a mode explicitly.
    Bridge.ofRows(spark,
      TopKPerGroupNode(groupCols.map(attr), order, k, None, analyzed))
  }
}

/** Logical node: an analysis/optimizer barrier with the child's schema.
  * groupExprs/order resolve through the standard generic resolution pass.
  */
case class TopKPerGroupNode(groupExprs: Seq[Expression],
                            order: Seq[SortOrder], k: Int,
                            sortBased: Option[Boolean],
                            child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroupNode =
    copy(child = c)
}

/** Plans [[TopKPerGroupNode]] onto [[TopKPerGroupExec]]. The execution mode
  * (heap vs sort-based) resolves from the active session conf HERE — at
  * planning time — unless the node pins it explicitly.
  */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, o, k, sb, child) =>
      val sortBased = sb.getOrElse(
        org.apache.spark.sql.internal.SQLConf.get
          .getConfString(TopKPerGroup.sortBasedKey, "false").toBoolean)
      // OPTIMIZATION r18 (guide §2.3 "aggregate before you shuffle"): in
      // heap mode, a PARTIAL per-map-partition top-k runs BELOW the
      // clustering exchange the final operator demands, so at most
      // (map partitions x groups x k) rows cross the wire instead of
      // every input row — the map-side-combine step every built-in
      // aggregate gets and this custom node previously lacked (measured:
      // q_sample_percentile shuffled all 600k lineitem rows, 40 MB, into
      // 3 group partitions). Exact under the operator's documented
      // total-order contract: global top-k == top-k of the per-partition
      // top-k union. Sort mode keeps its single-pass O(1)-state shape
      // (it exists for group cardinalities where per-partition heap
      // state is exactly what the caller opted out of).
      val planned = planLater(child)
      val c = if (sortBased) planned
              else TopKPerGroupPartialExec(g, o, k, planned)
      TopKPerGroupExec(g, o, k, sortBased, c) :: Nil
    case _ => Nil
  }
}

/** Physical grouped top-k. Two modes (see [[TopKPerGroup]] memory
  * contract):
  *
  *  - heap (default): one bounded binary heap per group per partition.
  *    Requires clustering on the group key (EnsureRequirements inserts the
  *    hash exchange — or elides it when the child is already
  *    co-partitioned, e.g. bucketed input) but NO child ordering: rows
  *    stream through once, each compared against its group's current k-th
  *    best in O(log k).
  *  - sortBased: additionally demands child ordering on (group, order) —
  *    Spark's spill-safe SortExec supplies it — and streams the first k
  *    rows of each group in O(1) state. Same output, bounded memory at any
  *    group cardinality.
  */
case class TopKPerGroupExec(groupExprs: Seq[Expression],
                            order: Seq[SortOrder], k: Int,
                            sortBased: Boolean,
                            child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  // Group identity is UnsafeRow byte equality on the projected key, and the
  // clustering exchange hashes the raw key bytes — so the key expressions
  // are float-canonicalized EVERYWHERE they appear (-0.0 → 0.0, any NaN bit
  // pattern → canonical NaN, recursively through arrays/structs): without
  // this, ordering-equal but byte-distinct keys split one logical group —
  // the hash exchange scatters them to different partitions, the sort mode
  // interleaves them (SQLOrderingUtil compares -0.0 == 0.0) and resets the
  // first-k counter mid-group, and the heap mode keeps two heaps. This is
  // the normalization Spark's optimizer (NormalizeFloatingNumbers) inserts
  // in front of its own hash aggregates, which custom nodes don't receive.
  private lazy val normGroup: Seq[Expression] =
    groupExprs.map(Bridge.normalizeFloats)

  override def requiredChildDistribution: Seq[Distribution] =
    if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(normGroup) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (sortBased)
      Seq(normGroup.map(SortOrder(_, Ascending)) ++ order)
    else Seq(Nil)

  override protected def doExecute(): RDD[InternalRow] = {
    val boundOrder = order
    val childOutput = child.output
    val groupE = normGroup // float-canonicalized: see normGroup's contract
    val limit = k
    if (sortBased) {
      // child arrives (group, order)-sorted: emit the first k per group
      child.execute().mapPartitions({ iter =>
        val keyProj = UnsafeProjection.create(groupE, childOutput)
        var current: UnsafeRow = null
        var n = 0
        iter.filter { row =>
          val key = keyProj(row)
          if (current == null || key != current) { current = key.copy(); n = 0 }
          n += 1
          n <= limit
        }
      }, preservesPartitioning = true)
    } else {
      val maxGroups = conf.getConfString(TopKPerGroup.maxHeapGroupsKey,
        (4 * 1024 * 1024).toString).toLong
      child.execute().mapPartitions(
        TopKPerGroupExec.heapPartition(boundOrder, childOutput, groupE,
          limit, maxGroups),
        preservesPartitioning = true)
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

object TopKPerGroupExec {
  /** The bounded per-group heap pass over one partition's rows — shared
    * by the final (post-exchange) operator and the map-side partial.
    */
  private[plans] def heapPartition(boundOrder: Seq[SortOrder],
      childOutput: Seq[Attribute], groupE: Seq[Expression], limit: Int,
      maxGroups: Long): Iterator[InternalRow] => Iterator[InternalRow] =
    { iter =>
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
          if (heaps.size >= maxGroups)
            // fail fast with guidance instead of an opaque executor OOM:
            // the heap state is off-manager JVM memory with no spill path
            throw new IllegalStateException(
              s"TopKPerGroup: > $maxGroups groups in one partition; " +
                s"set ${TopKPerGroup.sortBasedKey}=true for " +
                "high-cardinality group keys (bounded-memory sort mode) " +
                s"or raise ${TopKPerGroup.maxHeapGroupsKey}")
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
    }
}

/** MAP-SIDE partial top-k (heap mode only): the same bounded-heap pass
  * run on the child's existing partitioning, BELOW the clustering
  * exchange [[TopKPerGroupExec]] demands — so the exchange moves at most
  * (partitions x groups x k) candidate rows instead of every input row.
  * Exact under the caller's total-order contract (the final pass reduces
  * the per-partition survivors); same maxHeapGroups fail-fast, since the
  * map side sees at most as many groups per partition as the final side.
  */
case class TopKPerGroupPartialExec(groupExprs: Seq[Expression],
                                   order: Seq[SortOrder], k: Int,
                                   child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  private lazy val normGroup: Seq[Expression] =
    groupExprs.map(Bridge.normalizeFloats)

  override protected def doExecute(): RDD[InternalRow] = {
    val maxGroups = conf.getConfString(TopKPerGroup.maxHeapGroupsKey,
      (4 * 1024 * 1024).toString).toLong
    child.execute().mapPartitions(
      TopKPerGroupExec.heapPartition(order, child.output, normGroup, k,
        maxGroups),
      preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupPartialExec =
    copy(child = c)
}

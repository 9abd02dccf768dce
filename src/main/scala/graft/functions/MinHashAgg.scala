package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF (`Aggregator[IN, BUF, OUT]`): all `numHashes` MinHash minima
  * in a single pass over the shingles of a group.
  *
  * Equivalent to `numHashes` separate `min(xxhash64(i, shingle))` aggregate
  * columns (which Catalyst partial-aggregates per column), but with one
  * fixed-size buffer per group: one hash of the shingle bytes per seed,
  * merged associatively — the distributed sketch-aggregation pattern
  * (partial on the map side, merge on the reduce side), which is exactly
  * how HLL/quantile sketches aggregate at 100 TB.
  */
class MinHashAggregator(numHashes: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    val bytes = org.apache.spark.unsafe.types.UTF8String.fromString(shingle)
    var i = 0
    while (i < numHashes) {
      val h = XXH64.hashUnsafeBytes(bytes.getBaseObject, bytes.getBaseOffset,
        bytes.numBytes, i.toLong)
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinHashAgg {
  /** Column form: `minhash_sig(shingleCol)` -> array<bigint> of minima. */
  def minhash_sig(shingle: Column, numHashes: Int = 32): Column =
    udaf(new MinHashAggregator(numHashes)).apply(shingle)
}

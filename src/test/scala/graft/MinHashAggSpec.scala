package graft

import org.apache.spark.sql.functions._

import graft.functions.MinHashAgg
import graft.operators.Dedup

/** The typed MinHash Aggregator (UDAF surface): merge-associativity and
  * agreement with a driver-side reference.
  */
class MinHashAggSpec extends SparkSpec {

  test("minhash_sig matches a driver-side reference over the same shingles") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e"), (2L, "a b c x y z")).toDF("id", "text")
      .withColumnRenamed("id", "doc_id")
    val sh = Seq(
      1L -> Seq("a b c", "b c d", "c d e"),
      2L -> Seq("a b c", "b c x", "c x y", "x y z"))
    val sigs = Dedup.shingles(docs, 3).groupBy("id")
      .agg(MinHashAgg.minhash_sig(col("shingle"), 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

    def refHash(s: String, seed: Long): Long = {
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, seed)
    }
    sh.foreach { case (id, shingles) =>
      val expect = (0 until 8).map(i => shingles.map(refHash(_, i.toLong)).min)
      assert(sigs(id) == expect, s"doc $id signature mismatch")
    }
  }

  test("identical docs share signatures; different docs differ") {
    import spark.implicits._
    val docs = Seq((1L, "w1 w2 w3 w4 w5"), (2L, "w1 w2 w3 w4 w5"),
      (3L, "q1 q2 q3 q4 q5")).toDF("doc_id", "text")
    val sigs = Dedup.shingles(docs, 3).groupBy("id")
      .agg(MinHashAgg.minhash_sig(col("shingle"), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("sketch accuracy: approx_count_distinct within its rsd of exact") {
    val rows = graft.queries.GroupingQueries.qApproxDistinct(spark, sf001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      // HLL++ at rsd=0.02: allow 5 sigma
      assert(math.abs(approx - exact) / exact <= 0.10,
        s"approx $approx vs exact $exact")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.gcolumns.{rolling_hash, simhash64}
import graft.operators.TextAnalysis

/** Custom text-hash expressions: rolling-hash fingerprint vs an independent
  * BigInt reference; SimHash locality property.
  */
class TextHashSpec extends SparkSpec {

  /** Independent slow reference: polynomial hash over UTF-8 bytes in BigInt
    * arithmetic, mod 2^61-1, base 1000003, +1 offset per byte.
    */
  private def referenceHash(s: String): Long = {
    val M = BigInt((1L << 61) - 1)
    var h = BigInt(0)
    for (b <- s.getBytes("UTF-8"))
      h = (h * 1000003 + (b & 0xff) + 1) % M
    h.toLong
  }

  test("rolling_hash matches BigInt reference incl. unicode and long strings") {
    import spark.implicits._
    val samples = Seq("", "a", "hello world", "x" * 10000, "你好 é ñ",
      "the quick\tbrown\nfox")
    val got = samples.toDF("s")
      .select(rolling_hash(col("s"))).as[Long].collect().toSeq
    assert(got == samples.map(referenceHash))
  }

  test("normalized fingerprint equates case/whitespace variants") {
    import spark.implicits._
    val df = Seq((1L, "Hello   World", "en", "s", 10L),
      (2L, "hello world", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val fps = TextAnalysis.fingerprints(df).collect()
    assert(fps(0).getLong(2) == fps(1).getLong(2)) // fp_normalized equal
    assert(fps(0).getLong(1) != fps(1).getLong(1)) // fp_raw differs
  }

  test("bigramCounts counts every occurrence, not per-doc distincts") {
    import spark.implicits._
    val docs = Seq("a b a b", "a b c").toDF("text")
    val out = TextAnalysis.bigramCounts(docs, topN = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "a b" occurs twice in doc 1 (positions 1 and 3) and once in doc 2
    assert(out == Map("a b" -> 3, "b a" -> 1, "b c" -> 1))
  }

  test("sorted_intersect_count equals size(array_intersect) on sorted distinct arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      val a = (1 to rnd.nextInt(40)).map(_ => s"w${rnd.nextInt(60)}").distinct.sorted
      val b = (1 to rnd.nextInt(40)).map(_ => s"w${rnd.nextInt(60)}").distinct.sorted
      (a, b)
    } :+ ((Seq.empty[String], Seq("x"))) :+ ((Seq("x"), Seq.empty[String]))
    val df = rows.toDF("a", "b")
      .select(
        graft.functions.gcolumns.sorted_intersect_count(col("a"), col("b"))
          .as("merge"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
    assert(df.filter(col("merge") =!= col("ref")).count() == 0)
    // SQL registry
    graft.functions.GraftFunctions.register(spark)
    assert(spark.sql(
      "SELECT sorted_intersect_count(array('a','b','c'), array('b','c','d'))")
      .head().getInt(0) == 2)
  }

  test("simhash: near-identical token sets land within small hamming distance") {
    import spark.implicits._
    val base = (1 to 100).map(i => s"tok$i").mkString(" ")
    val onEdit = base.replace("tok50", "changed")
    val unrelated = (1 to 100).map(i => s"other$i").mkString(" ")
    val df = Seq(base, onEdit, unrelated).toDF("text")
      .select(simhash64(split(col("text"), " ")).as("h")).as[Long].collect()
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(df(0), df(1)) <= 8, "one-token edit must stay close")
    assert(hamming(df(0), df(2)) >= 16, "disjoint vocab must be far")
  }
}

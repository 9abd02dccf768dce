package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training + encoding — the real tokenizer
  * pipeline of LLM pretraining (Sennrich et al.'s word-frequency
  * formulation, the one GPT-2/SentencePiece-BPE implementations use).
  *
  * Scale split (this is the load-bearing design point): the CORPUS-sized
  * work — word counting, and later encoding — is distributed; the merge
  * LOOP runs on the driver over the word-FREQUENCY dict, which is
  * vocabulary-sized (heavy-tailed, millions of entries at 100 TB, capped
  * here by `maxVocabWords` taken by frequency through
  * TakeOrderedAndProject), not corpus-sized. That is how production BPE
  * trainers work too: no pass over the corpus per merge, one pass total.
  * Encoding broadcasts the learned merge ranks and applies them per word
  * in a narrow map — nothing token-sized shuffles.
  *
  * Determinism: pair selection orders by (count desc, pair lexicographic),
  * so retrains on the same corpus reproduce the same merge table exactly.
  */
object Bpe {

  /** End-of-word marker (keeps word-final units distinct, per the paper). */
  val EndOfWord = "</w>"

  /** One learned merge: rank-ordered pair of adjacent units. */
  case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  /** Distributed word-frequency dict: the ONLY corpus-sized pass. */
  private def wordCounts(docs: DataFrame, maxVocabWords: Int,
                         textCol: String): Array[(String, Long)] =
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(maxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))

  /** Train `nMerges` merges. Driver loop over the bounded dict: each
    * iteration counts adjacent-unit pairs weighted by word frequency,
    * merges the winner everywhere, and records it.
    */
  def train(docs: DataFrame, nMerges: Int, maxVocabWords: Int = 100000,
            textCol: String = "text"): Seq[Merge] = {
    var words: Array[(Array[String], Long)] =
      wordCounts(docs, maxVocabWords, textCol).map { case (w, c) =>
        (w.map(_.toString).toArray :+ EndOfWord, c)
      }
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    while (rank < nMerges) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (units, c) =>
        var i = 0
        while (i < units.length - 1) {
          val k = (units(i), units(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) return merges.result()
      val ((l, r), cnt) = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }
      merges += Merge(rank, l, r, cnt)
      val joined = l + r
      words = words.map { case (units, c) =>
        if (units.length < 2) (units, c)
        else {
          val out = Array.newBuilder[String]
          var i = 0
          while (i < units.length) {
            if (i < units.length - 1 && units(i) == l && units(i + 1) == r) {
              out += joined
              i += 2
            } else {
              out += units(i)
              i += 1
            }
          }
          (out.result(), c)
        }
      }
      rank += 1
    }
    merges.result()
  }

  /** Apply learned merges to one word (rank order — lowest rank first,
    * exactly like training applied them).
    */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var units: Vector[String] = word.map(_.toString).toVector :+ EndOfWord
    var changed = true
    while (changed && units.length > 1) {
      var best = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < units.length - 1) {
        ranks.get((units(i), units(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; best = i }
        }
        i += 1
      }
      if (best < 0) changed = false
      else units = (units.take(best) :+ (units(best) + units(best + 1))) ++
        units.drop(best + 2)
    }
    units
  }

  /** Distributed encode: broadcast the merge ranks, tokenize per word in a
    * narrow map. Returns (doc_id, n_words, n_units, units_per_word).
    */
  def encodeStats(docs: DataFrame, merges: Seq[Merge],
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val ranks = spark.sparkContext.broadcast(
      merges.map(m => (m.left, m.right) -> m.rank).toMap)
    val unitCount = udf { text: String =>
      val ws = text.split(" ").filter(_.nonEmpty)
      ws.map(w => encodeWord(w, ranks.value).length.toLong).sum
    }
    // n_words must use the SAME non-empty filter as unitCount, or leading /
    // repeated spaces inflate the denominator and units_per_word dips < 1
    docs.select(col(idCol),
        size(filter(split(col(textCol), " "), w => length(w) > 0))
          .cast("long").as("n_words"),
        unitCount(col(textCol)).as("n_units"))
      .withColumn("units_per_word",
        col("n_units").cast("double") / col("n_words"))
  }

  /** The learned merge table as a DataFrame (rank-ordered). */
  def mergeTable(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF()
  }
}

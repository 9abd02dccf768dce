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

  /** GPT-2's bytes→unicode table: every UTF-8 byte value maps to a
    * PRINTABLE unicode char — printable bytes map to themselves, the rest
    * shift to U+0100+ in order. This makes the BASE alphabet exactly 256
    * symbols, so a finite vocabulary represents ANY string (no OOV ever —
    * the byte-level fallback GPT-2-class tokenizers use), and units stay
    * printable so a text-format vocab file round-trips verbatim.
    */
  val byteToChar: Array[Char] = {
    val printable = (('!'.toInt to '~'.toInt) ++
      ('¡'.toInt to '¬'.toInt) ++
      ('®'.toInt to 'ÿ'.toInt)).toSet
    val out = new Array[Char](256)
    var shift = 0
    for (b <- 0 until 256) {
      if (printable(b)) out(b) = b.toChar
      else { out(b) = (256 + shift).toChar; shift += 1 }
    }
    out
  }
  private val charToByte: Map[Char, Int] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** A word as byte-level base units (one mapped char per UTF-8 byte). */
  def byteUnits(word: String): Array[String] =
    word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => byteToChar(b & 0xff).toString)

  /** Inverse of byte-level encoding: merge-concatenated units back to the
    * original string. Total for any unit sequence the byte-level encoder
    * can emit — the round-trip proof lives in BpeSpec.
    */
  def decodeByteUnits(units: Seq[String]): String = {
    val bytes = units.flatMap(_.iterator).map(c => charToByte(c).toByte)
    new String(bytes.toArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Base units for a word. Char-level gets the paper's end-of-word marker;
    * byte-level does NOT (GPT-2 shape — the marker's own chars are valid
    * base-alphabet bytes, so a marker would make decoding ambiguous; word
    * boundaries live at the whitespace splitter instead).
    *
    * Char-level iterates CODE POINTS, not UTF-16 chars: `toCharArray`
    * would split an astral-plane character's surrogate pair into two
    * lone-surrogate units, which both breaks round-tripping and
    * desynchronizes from the DuckDB oracle's codepoint-indexed `w[i:i]`
    * state encoding (queries.BpeOracle).
    */
  private def baseUnits(word: String, byteLevel: Boolean): Array[String] =
    if (byteLevel) byteUnits(word)
    else word.codePoints().toArray
      .map(cp => new String(Character.toChars(cp))) :+ EndOfWord

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
            textCol: String = "text", byteLevel: Boolean = false): Seq[Merge] = {
    var words: Array[(Array[String], Long)] =
      wordCounts(docs, maxVocabWords, textCol).map { case (w, c) =>
        (baseUnits(w, byteLevel), c)
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
  def encodeWord(word: String, ranks: Map[(String, String), Int],
                 byteLevel: Boolean = false): Seq[String] = {
    var units: Vector[String] = baseUnits(word, byteLevel).toVector
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
    *
    * Implementation tier: a Scala UDF — the repo's ONLY one, and a
    * deliberate choice per SURVEY §7's preference order (builtin >
    * codegen Expression > UDF): the BPE encode loop is a data-dependent
    * iterative merge per word that no builtin composition expresses, and
    * its cost is the merge loop itself, not the UDF boundary — a custom
    * codegen Expression would re-implement the same JVM loop to save one
    * String argument's boxing. The heavy column work around it (word
    * split, counts) stays in builtins.
    */
  def encodeStats(docs: DataFrame, merges: Seq[Merge],
                  textCol: String = "text", idCol: String = "doc_id",
                  byteLevel: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    val ranks = spark.sparkContext.broadcast(
      merges.map(m => (m.left, m.right) -> m.rank).toMap)
    val unitCount = udf { text: String =>
      val ws = text.split(" ").filter(_.nonEmpty)
      ws.map(w => encodeWord(w, ranks.value, byteLevel).length.toLong).sum
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

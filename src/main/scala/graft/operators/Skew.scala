package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware join: salting for hot keys (SURVEY.md §2.2 / build-prompt
  * scale checklist).
  *
  * A shuffled join on a skewed key concentrates one key's rows in one task;
  * AQE's skew-join split handles *sort-merge* skew within a stage, but when
  * one key dominates end-to-end the standard fix is salting: the big side
  * scatters each row to one of `saltBuckets` sub-keys, the small(er) side
  * replicates each row to ALL sub-keys, and the join key becomes
  * (key, salt). Result is identical to the plain join; the hot key now
  * occupies `saltBuckets` tasks.
  */
object Skew {

  /** Inner equi-join of `big` and `small` on `key`, salted. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int = 8): DataFrame = {
    require(saltBuckets > 0)
    // deterministic scatter: hash of the whole big-side row modulo buckets
    // (not rand() — reproducible plans re-execute identically, which
    // matters for speculative retries and for the driver's hash-compare)
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(saltBuckets)))
    val smallSalted = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    bigSalted.join(smallSalted,
        bigSalted(key) === smallSalted(key) &&
          bigSalted("__salt") === smallSalted("__salt"))
      .drop(smallSalted(key)).drop("__salt")
  }
}

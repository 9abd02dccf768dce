package graft

/** Registry semantics for the scoped cache — one live entry per family,
  * same-key reuse, and the r10 hit/miss counters the bench record reads.
  */
class CachesSpec extends SparkSpec {
  import spark.implicits._

  test("same key hits, key change evicts, counters record both") {
    val fam = s"spec-${System.nanoTime()}" // unique family per run
    def build = Seq(1, 2, 3).toDF("x")
    val before = Caches.counters.getOrElse(fam, (0L, 0L))
    val a = Caches.cached(fam, "k1")(build)
    val b = Caches.cached(fam, "k1")(build)
    assert(a eq b, "same (family, key) must return the SAME persisted frame")
    val c = Caches.cached(fam, "k2")(build)
    assert(!(c eq a), "a key change must rebuild")
    // (the predecessor's unpersist is blocking=false by design — its
    // storageLevel flips asynchronously, so only the live frame is checked)
    assert(c.storageLevel.useDisk, "the live frame stays persisted")
    val (h, m) = Caches.counters(fam)
    assert(h - before._1 == 1 && m - before._2 == 2,
      s"expected 1 hit / 2 misses, got ${(h - before._1, m - before._2)}")
    // memo registry shares the counter surface
    val vfam = s"$fam-memo"
    assert(Caches.memo(vfam, "k")(41) == 41)
    assert(Caches.memo[Int](vfam, "k")(sys.error("must not recompute")) == 41)
    assert(Caches.counters(vfam) == ((1L, 1L)))
  }
}

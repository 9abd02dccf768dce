package graft

/** Registry semantics for the scoped cache — bounded live entries per
  * family (capacity 2 since r11: raw-corpus + curated-view working set),
  * same-key reuse, LRU eviction, and the r10 hit/miss counters the bench
  * record reads.
  */
class CachesSpec extends SparkSpec {
  import spark.implicits._

  test("same key hits, capacity-overflow evicts LRU, counters record both") {
    val fam = s"spec-${System.nanoTime()}" // unique family per run
    // one DISTINCT plan per key: identical plans would alias in Spark's
    // CacheManager and an eviction of one would silently unpersist all
    def build(i: Int) = Seq(i, i + 1).toDF("x")
    val before = Caches.counters.getOrElse(fam, (0L, 0L))
    val a = Caches.cached(fam, "k1")(build(1))
    val b = Caches.cached(fam, "k1")(build(1))
    assert(a eq b, "same (family, key) must return the SAME persisted frame")
    val c = Caches.cached(fam, "k2")(build(2))
    assert(!(c eq a), "a new key must build its own frame")
    // capacity 2: BOTH corpora stay resident — the r11 fix for the
    // curated-view/raw-corpus thrash (each re-request is a hit, not a
    // rebuild)
    assert(Caches.cached(fam, "k1")(sys.error("k1 must still be live")) eq a)
    assert(Caches.cached(fam, "k2")(sys.error("k2 must still be live")) eq c)
    // a third key overflows capacity and evicts the LRU entry (k2 was
    // touched after k1 just above, so k1 is the evictee)...
    val d = Caches.cached(fam, "k3")(build(3))
    assert(Caches.cached(fam, "k2")(sys.error("k2 must survive k3")) eq c)
    // ...and re-requesting k1 rebuilds (a miss, proving the eviction)
    val a2 = Caches.cached(fam, "k1")(build(1))
    assert(!(a2 eq a), "the LRU entry must have been evicted at capacity")
    assert(d ne null) // k3 itself was the LRU evictee of the k1 rebuild
    // (evictees unpersist blocking=false — their storageLevel flips
    // asynchronously, so only the just-built live frame is checked)
    assert(a2.storageLevel.useDisk, "live frames stay persisted")
    val (h, m) = Caches.counters(fam)
    assert(h - before._1 == 4 && m - before._2 == 4,
      s"expected 4 hits / 4 misses, got ${(h - before._1, m - before._2)}")
    // memo registry shares the counter surface
    val vfam = s"$fam-memo"
    assert(Caches.memo(vfam, "k")(41) == 41)
    assert(Caches.memo[Int](vfam, "k")(sys.error("must not recompute")) == 41)
    assert(Caches.counters(vfam) == ((1L, 1L)))
  }
}

package graft

/** Registry semantics for the scoped cache — bounded live entries per
  * family (capacity 3 since r11: raw corpus + curated view + one-shot
  * index-build frame), same-key reuse, LRU eviction, and the r10
  * hit/miss counters the bench record reads.
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
    // capacity 3: all three corpora stay resident — the r11 fix for the
    // raw/curated/build-frame thrash (each re-request is a hit)
    assert(Caches.cached(fam, "k1")(sys.error("k1 must still be live")) eq a)
    assert(Caches.cached(fam, "k2")(sys.error("k2 must still be live")) eq c)
    val d = Caches.cached(fam, "k3")(build(3))
    assert(Caches.cached(fam, "k1")(sys.error("k1 must survive k3")) eq a)
    // a fourth key overflows capacity and evicts the LRU entry (touch
    // order is now k1, k3, k2 — so k2 is the evictee)...
    val e = Caches.cached(fam, "k4")(build(4))
    assert(Caches.cached(fam, "k3")(sys.error("k3 must survive k4")) eq d)
    // ...and re-requesting k2 rebuilds (a miss, proving the eviction)
    val c2 = Caches.cached(fam, "k2")(build(2))
    assert(!(c2 eq c), "the LRU entry must have been evicted at capacity")
    assert(e ne null)
    // (evictees unpersist blocking=false — their storageLevel flips
    // asynchronously, so only the just-built live frame is checked)
    assert(c2.storageLevel.useDisk, "live frames stay persisted")
    val (h, m) = Caches.counters(fam)
    assert(h - before._1 == 5 && m - before._2 == 5,
      s"expected 5 hits / 5 misses, got ${(h - before._1, m - before._2)}")
    // memo registry shares the counter surface
    val vfam = s"$fam-memo"
    assert(Caches.memo(vfam, "k")(41) == 41)
    assert(Caches.memo[Int](vfam, "k")(sys.error("must not recompute")) == 41)
    assert(Caches.counters(vfam) == ((1L, 1L)))
  }
}

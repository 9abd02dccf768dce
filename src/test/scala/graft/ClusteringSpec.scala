package graft

import org.apache.spark.sql.functions._

import graft.operators.Clustering

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  // two tight groups far apart, with ids CHOSEN so the deterministic md5
  // init seeds one centroid in each blob (ids 101 and 1 have the two
  // lowest md5 of the eight) — Lloyd's is only as good as its init, and
  // a both-seeds-in-one-blob init legitimately converges to a split blob
  private def twoBlobs = Seq(
    (0L, Seq(0.0, 0.0, 0.0), "a"), (1L, Seq(0.01, 0.0, 0.0), "a"),
    (2L, Seq(0.0, 0.01, 0.0), "a"), (3L, Seq(0.01, 0.01, 0.0), "a"),
    (100L, Seq(0.9, 0.9, 0.9), "b"), (101L, Seq(0.91, 0.9, 0.9), "b"),
    (102L, Seq(0.9, 0.91, 0.9), "b"), (104L, Seq(0.91, 0.91, 0.9), "b")
  ).toDF("vec_id", "embedding", "label")

  test("kmeans separates well-spread blobs and assigns every vector") {
    val a = Clustering.kmeansAssign(twoBlobs, k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.size == 8)
    val blobA = Seq(0L, 1L, 2L, 3L).map(a)
    val blobB = Seq(100L, 101L, 102L, 104L).map(a)
    assert(blobA.distinct.size == 1, s"blob A split: $a")
    assert(blobB.distinct.size == 1, s"blob B split: $a")
    assert(blobA.head != blobB.head, s"blobs merged: $a")
  }

  test("kmeans is deterministic run to run") {
    val r1 = Clustering.kmeansAssign(twoBlobs, k = 2, iters = 2)
      .orderBy("vec_id").collect().toSeq
    val r2 = Clustering.kmeansAssign(twoBlobs, k = 2, iters = 2)
      .orderBy("vec_id").collect().toSeq
    assert(r1 == r2)
  }

  test("clusters that empty drop out; ids keep their init rank (gaps ok)") {
    // two groups of IDENTICAL vectors with k=3: two of the three init
    // seeds share a value, so their members tie and collapse onto the
    // lower cluster id — exactly one cluster empties, leaving 2 ids
    // (possibly with a gap), each group pure
    val dupGroups = ((0L to 5L).map(i => (i, Seq(0.1, 0.1))) ++
      (10L to 15L).map(i => (i, Seq(0.9, 0.9)))).toDF("vec_id", "embedding")
    val a = Clustering.kmeansAssign(dupGroups, k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.size == 12)
    val ids = a.values.toSet
    assert(ids.size == 2, s"one duplicate-seed cluster must empty: $a")
    assert(ids.subsetOf(Set(0L, 1L, 2L)), s"ids outside init ranks: $ids")
    assert((0L to 5L).map(a).distinct.size == 1, s"group X split: $a")
    assert((10L to 15L).map(a).distinct.size == 1, s"group Y split: $a")
  }

  test("a corpus collapsing to a single surviving centroid still assigns") {
    // all-identical vectors: every row ties at distance 0 and the lowest
    // cluster id wins, so cluster 1 empties after round 1 — the next
    // assignment pass runs with ONE centroid (the `least` arity edge)
    val same = (0L to 5L).map(i => (i, Seq(0.5, 0.5))).toDF("vec_id", "embedding")
    val a = Clustering.kmeansAssign(same, k = 2, iters = 2)
      .select("cluster").as[Long].collect()
    assert(a.length == 6 && a.forall(_ == 0L), a.toSeq)
  }

  test("exact-arithmetic budget guard fires before results degrade") {
    // scale so large that even a 6-member cluster exceeds the 2^53 budget
    val e = intercept[IllegalArgumentException] {
      Clustering.kmeansAssign(
        (0L to 5L).map(i => (i, Seq(0.5, 0.5))).toDF("vec_id", "embedding"),
        k = 2, iters = 1, scale = Int.MaxValue)
    }
    assert(e.getMessage.contains("exact-arithmetic budget"))
  }

  test("kmeansSample caps each cluster at its quota, deterministically") {
    val s = Clustering.kmeansSample(twoBlobs, k = 2, iters = 2,
        perCluster = 3)
      .orderBy("cluster", "rn").collect()
    val byCluster = s.groupBy(_.getLong(0))
    assert(byCluster.size == 2, s"sample must cover both clusters: ${s.toSeq}")
    // each 4-member blob capped at 3, rn dense from 1
    byCluster.values.foreach { rows =>
      assert(rows.length == 3)
      assert(rows.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
    }
    // quota larger than the cluster keeps the whole cluster
    val all = Clustering.kmeansSample(twoBlobs, k = 2, iters = 2,
      perCluster = 100).collect()
    assert(all.length == 8)
    // deterministic run to run
    val again = Clustering.kmeansSample(twoBlobs, k = 2, iters = 2,
      perCluster = 3).orderBy("cluster", "rn").collect()
    assert(s.toSeq == again.toSeq)
  }

  test("kmeansRoute assigns a stream bit-identically to the batch E step") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batch = Clustering.kmeansAssign(twoBlobs, k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val input = MemoryStream[(Long, Seq[Double])]
    val routed = Clustering.kmeansRoute(
      input.toDF().toDF("vec_id", "embedding"), twoBlobs, k = 2, iters = 2)
    val q = routed.writeStream.format("memory").queryName("routed").start()
    try {
      // replay the corpus itself plus an unseen vector near blob B
      input.addData(twoBlobs.collect().toSeq
        .map(r => (r.getLong(0), r.getSeq[Double](1))) :+
        (999L, Seq(0.92, 0.9, 0.89)))
      q.processAllAvailable()
      val out = spark.table("routed").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out.size == 9)
      assert(batch.forall { case (id, cl) => out(id) == cl },
        s"stream routing must match batch assignment: $out vs $batch")
      assert(out(999L) == batch(100L), s"unseen vector near blob B: $out")
    } finally q.stop()
  }

  test("kmeansProfile threads custom column names") {
    val renamed = twoBlobs.toDF("id", "vec", "lang")
    val p = Clustering.kmeansProfile(renamed, k = 2, iters = 2,
        idCol = "id", vecCol = "vec", labelCol = "lang")
      .orderBy("cluster").collect()
    assert(p.length == 2)
    assert(p.map(_.getLong(1)).toSeq == Seq(4L, 4L)) // n_members balanced
    assert(p.map(_.getLong(2)).forall(_ == 1L)) // one label per blob
  }
}

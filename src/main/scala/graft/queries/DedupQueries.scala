package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.Dedup

/** Dedup operator coverage. The corpus for exact/simhash dedup is augmented
  * with planted exact copies (doc_id + 1000000 for doc_id % 100 == 0) so the
  * operators have guaranteed work; near-dup operators run on the raw corpus,
  * which the generator seeded with real near-duplicates (max shingle Jaccard
  * ~0.99 at sf0.01).
  */
object DedupQueries {

  private def augmented(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    docs.unionByName(
      docs.filter(col("doc_id") % 100 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))
  }

  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactDedup(augmented(spark, dir))
      .select(col("doc_id"), col("n_copies"), length(col("text")).as("n_chars"))
      .orderBy("doc_id")

  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(t(spark, dir, "documents"), k = 3, threshold = 0.6)
      .orderBy("da", "db")

  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(t(spark, dir, "documents"), k = 3,
        numHashes = 32, bands = 16, threshold = 0.6)
      .orderBy("da", "db")

  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(augmented(spark, dir), maxDist = 3)
      .orderBy("da", "db")

  def dedupEmbedCosine(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingPairs(t(spark, dir, "embeddings"), threshold = 0.4,
        probeFilter = col("vec_id") % 20 === 0)
      .orderBy("da", "db")

  def dedupSemantic(spark: SparkSession, dir: String): DataFrame =
    Dedup.semanticPairs(t(spark, dir, "embeddings"), tau = 0.3)
      .orderBy("da", "db")

  /** Near-dup clusters over the exact-Jaccard pair graph (min-label
    * propagation components; oracle = recursive-CTE reachability).
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    Dedup.dedupClusters(
        Dedup.ngramJaccardPairs(t(spark, dir, "documents"), k = 3,
          threshold = 0.6))
      .orderBy("cluster_id")

  /** The same clusters through the distributed large-star/small-star path
    * (the 100 TB fallback that normally only engages past
    * `driverPairLimit`) — oracle-checked against the identical
    * recursive-CTE reachability SQL as `dedup_clusters`, so BOTH component
    * algorithms carry cell-exact verification, not just the property test.
    */
  def dedupClustersStar(spark: SparkSession, dir: String): DataFrame =
    Dedup.starComponents(
        Dedup.ngramJaccardPairs(t(spark, dir, "documents"), k = 3,
          threshold = 0.6))
      .orderBy("cluster_id")

  /** The deduplicated corpus itself — what a training pipeline actually
    * consumes: every near-dup cluster collapsed to its min-id
    * representative, accounted per language. (Cluster mining is verified
    * by `dedup_clusters`; this verifies the keep/drop application.)
    */
  def dedupCorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    Dedup.dedupCorpus(docs,
        Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.6))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("lang")
  }

  /** Fuzzy (edit-distance) pairs with PLANTED typos on BOTH affixes plus
    * a planted TOKEN REORDER: every 83rd document re-enters under a
    * shifted id with " zq" appended (suffix edit — prefix block catches
    * it), every 89th with "zq " PREPENDED (prefix edit — exactly the copy
    * a prefix-only blocker provably loses; the suffix block catches it),
    * and every 101st spawns a sibling PAIR ("a b "…" c d" vs
    * "b a "…" d c") whose members differ in BOTH affixes — invisible to
    * both affix blocks — but share a token multiset, so the sorted-token
    * block recovers them at edit distance 4. The blocked pipeline
    * recovers every planted pair of all three kinds (plus any natural
    * pairs within the distance budget).
    */
  def dedupFuzzy(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"))
    val sufTypos = docs.filter(col("doc_id") % 83 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(col("text"), lit(" zq")).as("text"))
    val preTypos = docs.filter(col("doc_id") % 89 === 0)
      .select((col("doc_id") + 20000000L).as("doc_id"),
        concat(lit("zq "), col("text")).as("text"))
    val reorderA = docs.filter(col("doc_id") % 101 === 0)
      .select((col("doc_id") + 30000000L).as("doc_id"),
        concat(lit("a b "), col("text"), lit(" c d")).as("text"))
    val reorderB = docs.filter(col("doc_id") % 101 === 0)
      .select((col("doc_id") + 40000000L).as("doc_id"),
        concat(lit("b a "), col("text"), lit(" d c")).as("text"))
    Dedup.fuzzyPairs(
        docs.unionByName(sufTypos).unionByName(preTypos)
          .unionByName(reorderA).unionByName(reorderB),
        maxEdit = 4)
      .orderBy("a_id", "b_id")
  }

  /** Near-dup pairs served from an INCREMENTALLY-GROWN stored index
    * ([[Dedup.appendLshIndex]]): the index is built from the even-id half
    * of the corpus, the odd-id half is appended (re-shingling only the
    * appended batch plus any df-crossing-affected docs), and the pair
    * search runs entirely from the stored tables — hash-checked against
    * the SAME exact-Jaccard oracle as the scan-path queries, so the
    * append path carries the same verification as a full rebuild.
    * IndexMaintenanceSpec additionally proves append-equals-rebuild table
    * for table, including a forced df-crossing.
    */
  /** The staged even-then-odd append-grown LSH index shared by
    * `dedup_lsh_incremental` and `dedup_route_exact`.
    */
  private def incrIndex(spark: SparkSession, dir: String): String =
    graft.Caches.stagedPath("lsh-incr", dir) { base =>
      val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"))
      Dedup.writeLshIndex(docs.filter(col("doc_id") % 2 === 0), base)
      Dedup.appendLshIndex(docs.filter(col("doc_id") % 2 === 1), base)
    }

  def dedupLshIncremental(spark: SparkSession, dir: String): DataFrame =
    Dedup.pairsFromIndex(spark, incrIndex(spark, dir)).orderBy("da", "db")

  /** Near-dup pairs served AFTER a tombstone delete against the stored
    * index ([[Dedup.deleteFromLshIndex]] — the FORGET half of the
    * maintenance tier): the index is built over the full corpus, the
    * `doc_id % 7 = 3` slice is forgotten, and the pair search runs from
    * the served views. The result is exactly the full-corpus
    * exact-Jaccard pairs restricted to live endpoints, because deletes
    * keep `df` a HISTORICAL upper bound by documented design — the
    * oracle mirrors that semantics precisely (document frequencies over
    * the FULL corpus, kept shingles and pairs over the LIVE docs), so
    * the forget path carries the same hash-exact verification as the
    * scan and append paths.
    */
  private def forgetIndex(spark: SparkSession, dir: String): String =
    graft.Caches.stagedPath("lsh-forget", dir) { base =>
      // derive from the shared append-grown index by FILE COPY instead of
      // a second re-shingle build: append-equals-rebuild is spec-proven
      // table for table (IndexMaintenanceSpec), so the copy serves
      // exactly what a fresh full-corpus build would — the delete is the
      // only work this fixture adds
      copyTree(incrIndex(spark, dir), base)
      val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"))
      Dedup.deleteFromLshIndex(docs.filter(col("doc_id") % 7 === 3), base)
    }

  /** Recursive file copy — the forget fixtures' derive-by-copy step
    * (shared with the BM25 forget fixture in [[TextQueries]]).
    */
  private[queries] def copyTree(srcDir: String, dstDir: String): Unit = {
    val src = java.nio.file.Paths.get(srcDir)
    val dst = java.nio.file.Paths.get(dstDir)
    import scala.jdk.CollectionConverters._
    val w = java.nio.file.Files.walk(src)
    try w.iterator().asScala.foreach { p =>
      val target = dst.resolve(src.relativize(p).toString)
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(target)
      else {
        java.nio.file.Files.createDirectories(target.getParent)
        java.nio.file.Files.copy(p, target,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    } finally w.close()
  }

  def dedupLshForget(spark: SparkSession, dir: String): DataFrame =
    Dedup.pairsFromIndex(spark, forgetIndex(spark, dir)).orderBy("da", "db")

  /** The EXACT streaming near-dup route ([[Dedup.jaccardRoute]] — stored
    * prefix-filter postings + in-row verification, zero LSH recall
    * caveat) replayed over the corpus against the append-grown stored
    * index: every doc arrives once, each verified pair surfaces from
    * both endpoints and dedupes, and the result hash-checks against the
    * SAME exact-Jaccard oracle as the batch scan queries — the
    * deterministic-completeness proof of the prefix-filter candidate
    * rule (the symmetric form over a static hash order, the
    * append-invariant property the stored table needs).
    */
  def dedupRouteExact(spark: SparkSession, dir: String): DataFrame = {
    val base = incrIndex(spark, dir)
    // the whole-corpus replay is a BATCH consumer: cache the arrival-side
    // kept arrays (one narrow shingling pass otherwise re-run by the
    // candidate probe, the pair re-attach, and every bench pass)
    val kept = graft.Caches.cached("route-kept", s"$base|$dir") {
      Dedup.keptForRoute(t(spark, dir, "documents")
        .select(col("doc_id"), col("text")), base)
    }
    Dedup.jaccardRouteOnKept(kept, base, threshold = 0.6,
        cacheKey = Some(s"$base|$dir"))
      .select(least(col("sid"), col("id")).as("da"),
        greatest(col("sid"), col("id")).as("db"), col("jaccard"))
      .dropDuplicates("da", "db")
      .orderBy("da", "db")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_lsh_incremental" -> dedupLshIncremental,
    "dedup_lsh_forget" -> dedupLshForget,
    "dedup_route_exact" -> dedupRouteExact,
    "dedup_fuzzy" -> dedupFuzzy,
    "dedup_corpus" -> dedupCorpus,
    "dedup_exact" -> dedupExact,
    "dedup_ngram_jaccard" -> dedupNgramJaccard,
    "dedup_minhash_lsh" -> dedupMinhashLsh,
    "dedup_simhash" -> dedupSimhash,
    "dedup_embed_cosine" -> dedupEmbedCosine,
    "dedup_semantic" -> dedupSemantic,
    "dedup_clusters" -> dedupClusters,
    "dedup_clusters_star" -> dedupClustersStar)

  /** Shared inverted-index Jaccard CTE chain in DuckDB (mirrors
    * Dedup.ngramJaccardPairs step for step, independently). `pairs` is the
    * final pair set; callers add their own SELECT.
    */
  private[queries] val jaccardCtes: String =
    """tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |idx AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks)-2)) AS i FROM tok),
      |sh0 AS (SELECT DISTINCT doc_id AS id, array_to_string(toks[i:i+2], ' ') AS shingle FROM idx),
      |df AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) <= 1000),
      |sh AS (SELECT sh0.id, sh0.shingle FROM sh0 JOIN df USING (shingle)),
      |sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
      |inter AS (SELECT a.id AS da, b.id AS db, COUNT(*) AS inter
      |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
      |          GROUP BY a.id, b.id),
      |pairs AS (SELECT da, db, CAST(inter AS DOUBLE) / (x.n + y.n - inter) AS jaccard
      |          FROM inter JOIN sizes x ON da = x.id JOIN sizes y ON db = y.id
      |          WHERE CAST(inter AS DOUBLE) / (x.n + y.n - inter) >= 0.6)""".stripMargin

  private val jaccardSql: String =
    s"WITH $jaccardCtes\nSELECT da, db, jaccard FROM pairs ORDER BY da, db"

  /** The forget-path replay: identical chain, except kept shingles (and
    * hence sizes/pairs) restrict to LIVE docs while `df` still counts
    * the FULL corpus — the engine's documented historical-upper-bound
    * delete semantics, encoded in the oracle.
    */
  private val forgetSql: String = {
    val liveSh = "sh AS (SELECT sh0.id, sh0.shingle FROM sh0 " +
      "JOIN df USING (shingle) WHERE sh0.id % 7 <> 3)"
    val ctes = jaccardCtes.replace(
      "sh AS (SELECT sh0.id, sh0.shingle FROM sh0 JOIN df USING (shingle))",
      liveSh)
    require(ctes.contains(liveSh), "jaccardCtes shape drifted")
    s"WITH $ctes\nSELECT da, db, jaccard FROM pairs ORDER BY da, db"
  }

  /** Connected components via recursive-CTE reachability: comp(id) =
    * min id reachable over the (symmetric) pair edges — the independent
    * derivation of Dedup.dedupClusters' label-propagation fixpoint.
    */
  private val clustersSql: String =
    s"""WITH RECURSIVE $jaccardCtes,
      |edges AS (SELECT da AS a, db AS b FROM pairs
      |          UNION ALL SELECT db, da FROM pairs),
      |reach AS (
      |  SELECT DISTINCT a AS id, a AS r FROM edges
      |  UNION
      |  SELECT e.a AS id, rc.r FROM edges e JOIN reach rc ON rc.id = e.b),
      |comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id)
      |SELECT comp AS cluster_id, COUNT(*) AS n_docs, MAX(id) AS max_doc
      |FROM comp GROUP BY comp ORDER BY cluster_id""".stripMargin

  private val cosineSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |p AS (SELECT a.vec_id AS da, b.vec_id AS db,
      |        list_inner_product(a.v, b.v) /
      |          (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))) AS cos
      |      FROM e a JOIN e b ON a.vec_id % 20 = 0 AND a.vec_id < b.vec_id)
      |SELECT da, db, cos FROM p WHERE cos >= 0.4 ORDER BY da, db""".stripMargin

  /** Anti-join of the corpus against non-representative cluster members
    * (comp <> id), re-using the recursive-CTE component derivation.
    */
  private val dedupCorpusSql: String =
    s"""WITH RECURSIVE $jaccardCtes,
      |edges AS (SELECT da AS a, db AS b FROM pairs
      |          UNION ALL SELECT db, da FROM pairs),
      |reach AS (
      |  SELECT DISTINCT a AS id, a AS r FROM edges
      |  UNION
      |  SELECT e.a AS id, rc.r FROM edges e JOIN reach rc ON rc.id = e.b),
      |comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
      |dropped AS (SELECT id FROM comp WHERE id <> comp)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM documents WHERE doc_id NOT IN (SELECT id FROM dropped)
      |GROUP BY lang ORDER BY lang""".stripMargin

  val oracles: Map[String, String] = Map(
    "dedup_fuzzy" ->
      """WITH u AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000000, text || ' zq' FROM documents
        |  WHERE doc_id % 83 = 0
        |  UNION ALL
        |  SELECT doc_id + 20000000, 'zq ' || text FROM documents
        |  WHERE doc_id % 89 = 0
        |  UNION ALL
        |  SELECT doc_id + 30000000, 'a b ' || text || ' c d' FROM documents
        |  WHERE doc_id % 101 = 0
        |  UNION ALL
        |  SELECT doc_id + 40000000, 'b a ' || text || ' d c' FROM documents
        |  WHERE doc_id % 101 = 0),
        |k AS (SELECT doc_id, text, unnest([
        |        md5('p:' || substring(text, 1, 24)),
        |        md5('s:' || right(text, 24)),
        |        md5('t:' || array_to_string(list_sort(string_split(text, ' ')), ' '))
        |      ]) AS bk FROM u),
        |s AS (SELECT bk FROM k GROUP BY bk
        |      HAVING COUNT(*) BETWEEN 2 AND 100),
        |kk AS (SELECT k.* FROM k JOIN s USING (bk))
        |SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(levenshtein(a.text, b.text) AS INT) AS edit_distance
        |FROM kk a JOIN kk b ON a.bk = b.bk AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.text, b.text) <= 4
        |ORDER BY a_id, b_id""".stripMargin,
    "dedup_semantic" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |bx AS (SELECT vec_id, v,
        |         list_position(list_transform(v, x -> abs(x)),
        |           list_max(list_transform(v, x -> abs(x)))) AS idx
        |       FROM e),
        |blk AS (SELECT vec_id, v,
        |          idx * 2 + CASE WHEN v[idx] >= 0 THEN 1 ELSE 0 END AS cell
        |        FROM bx),
        |p AS (SELECT a.vec_id AS da, b.vec_id AS db,
        |        list_inner_product(a.v, b.v) /
        |          (sqrt(list_inner_product(a.v, a.v))
        |           * sqrt(list_inner_product(b.v, b.v))) AS cos
        |      FROM blk a JOIN blk b
        |        ON a.cell = b.cell AND a.vec_id < b.vec_id)
        |SELECT da, db, cos FROM p WHERE cos >= 0.3
        |ORDER BY da, db""".stripMargin,
    "dedup_corpus" -> dedupCorpusSql,
    "dedup_exact" ->
      """WITH aug AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 100 = 0)
        |SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies,
        |  length(text) AS n_chars
        |FROM aug GROUP BY text ORDER BY doc_id""".stripMargin,
    "dedup_ngram_jaccard" -> jaccardSql,
    // LSH+verify equals the exact pairs (recall ~0.999 at the threshold;
    // the verify step removes every false positive) — same oracle.
    "dedup_minhash_lsh" -> jaccardSql,
    // the append-grown stored index must serve the same pair set
    "dedup_lsh_incremental" -> jaccardSql,
    // post-delete serving: df stays the full corpus's (historical upper
    // bound by design), kept shingles and pairs restrict to live docs
    "dedup_lsh_forget" -> forgetSql,
    "dedup_route_exact" -> jaccardSql,
    "dedup_embed_cosine" -> cosineSql,
    "dedup_clusters" -> clustersSql,
    // same reachability oracle: both component algorithms must agree with it
    "dedup_clusters_star" -> clustersSql,
    "dedup_simhash" -> SimhashOracle.pairsSql)
}

/** DuckDB replay of [[graft.functions.SimHash64]] — the r10
  * `text_fingerprint` conversion template applied to SimHash (VERDICT r10
  * ask #2): the oracle recomputes Spark's exact per-token XXH64 (seed 42,
  * the `xxhash64` kernel of `functions/texthash.scala:27`) with HUGEINT
  * mod-2^64 arithmetic, takes the per-bit majority vote, and emits all
  * pairs at Hamming distance <= 3 by brute force — independently of the
  * engine's chunk-LSH search path, so the oracle also re-proves the
  * pigeonhole completeness argument of `Dedup.simhashPairs`.
  *
  * Two corpus facts the replay relies on, both drift-guarded in
  * TablesSpec: text is pure ASCII (`ascii(char)` = UTF-8 byte) and every
  * whitespace token is < 32 bytes (tokens at or above 32 bytes enter
  * XXH64's 4-lane stripe loop, which this SQL does not unroll).
  *
  * SQL-generation notes: DuckDB has no 64-bit wrap-around arithmetic
  * (BIGINT/UBIGINT overflow is an error), so every multiply routes
  * through HUGEINT with an explicit `% 2^64`, split so no intermediate
  * exceeds 2^127. Let-bindings are emulated with single-element
  * `list_transform([expr], v -> body)[1]` so each intermediate is bound
  * to a lambda variable once — naive textual substitution would grow the
  * SQL exponentially across the hash's sequential steps.
  */
private[queries] object SimhashOracle {
  private val T = "18446744073709551616" // 2^64
  private val P1 = "11400714785074694791"
  private val P2 = "14029467366897019727"
  private val P3 = "1609587929392839161"
  private val P4 = "9650029242287828579"
  private val P5 = "2870177450012600261"

  /** Bind `expr` to variable `v` inside `body`. */
  private def let(expr: String, v: String, body: String): String =
    s"list_transform([$expr], $v -> $body)[1]"

  /** a*b mod 2^64. `a` MUST be a bound variable (referenced 3x); `b` a
    * literal. Split form: a*b = (a%2^32)*b + ((a/2^32)*(b%2^32) mod 2^32)<<32,
    * keeping every intermediate under 2^96 (fits HUGEINT).
    */
  private def mul(a: String, b: String): String =
    s"CAST(((CAST($a % 4294967296 AS HUGEINT) * $b) % $T + " +
      s"CAST(((($a // 4294967296) * ($b % 4294967296)) % 4294967296)" +
      s" * 4294967296 AS HUGEINT)) % $T AS UBIGINT)"

  /** rotl(a, r) for a bound variable `a` (referenced 2x). */
  private def rotl(a: String, r: Int): String =
    s"(CAST((CAST($a AS HUGEINT) * ${1L << r}) % $T AS UBIGINT)" +
      s" | ($a >> ${64 - r}))"

  private def add(a: String, b: String): String =
    s"CAST((CAST($a AS HUGEINT) + $b) % $T AS UBIGINT)"

  private def xor(a: String, b: String): String = s"xor($a, $b)"

  /** Little-endian 8-byte word of byte list `bv` at 1-based offset expr. */
  private def word(base: String): String =
    (0 until 8).map(j => s"bv[$base + ${j + 1}] * ${1L << (8 * j)}")
      .mkString("(", " + ", ")")

  /** Full XXH64(seed=42) of token variable `tv`'s ASCII bytes — the
    * <32-byte path (stripe loop unreachable under the token-length guard).
    */
  private def tokenHash(tv: String): String = {
    val bytesExpr = s"list_transform(range(1, length($tv)+1)," +
      s" ii -> CAST(ascii($tv[ii:ii]) AS UBIGINT))"
    val h0 = s"CAST((CAST($P5 AS HUGEINT) + 42 + nv) % $T AS UBIGINT)"
    val words = s"list_transform(range(0, nv // 8), jj -> ${word("8*jj")})"
    val step8 =
      let(mul("w8", P2), "t1",
        let(rotl("t1", 31), "t2",
          let(mul("t2", P1), "t3",
            let(xor("ac8", "t3"), "u0",
              let(rotl("u0", 27), "u1",
                add(mul("u1", P1), P4))))))
    val fold8 = s"list_reduce(list_prepend(hv, wv), (ac8, w8) -> $step8)"
    val w4 = (0 until 4).map(j => s"bv[8*(nv//8) + ${j + 1}] * ${1L << (8 * j)}")
      .mkString("(", " + ", ")")
    val step4 =
      let(w4, "w4v",
        let(mul("w4v", P1), "s1",
          let(xor("g1", "s1"), "s2",
            let(rotl("s2", 23), "s3",
              add(mul("s3", P2), P3)))))
    val tail4 = s"CASE WHEN nv % 8 >= 4 THEN $step4 ELSE g1 END"
    val bstep =
      let(mul("bb", P5), "q1",
        let(xor("ac1", "q1"), "q2",
          let(rotl("q2", 11), "q3",
            mul("q3", P1))))
    val tailBytes =
      "bv[8*(nv//8) + (CASE WHEN nv % 8 >= 4 THEN 4 ELSE 0 END) + 1 : nv]"
    val foldb = s"list_reduce(list_prepend(g2, $tailBytes), (ac1, bb) -> $bstep)"
    val fmix =
      let(xor("g3", "(g3 >> 33)"), "f1",
        let(mul("f1", P2), "f2",
          let(xor("f2", "(f2 >> 29)"), "f3",
            let(mul("f3", P3), "f4",
              xor("f4", "(f4 >> 32)")))))
    let(bytesExpr, "bv",
      let("len(bv)", "nv",
        let(h0, "hv",
          let(words, "wv",
            let(fold8, "g1",
              let(tail4, "g2",
                let(foldb, "g3", fmix)))))))
  }

  /** 64-bit SimHash of a text column expr: per-bit strict-majority vote
    * over the token hashes (ties -> 0, as the kernel's `votes(b) > 0`).
    */
  private def simhashExpr(s: String): String = {
    val hashes =
      s"list_transform(string_split($s, ' '), tkv -> ${tokenHash("tkv")})"
    val bits = (0 until 64).map { b =>
      s"(CASE WHEN 2*len(list_filter(hs, hh -> ((hh >> $b) & 1) = 1)) > ntok" +
        s" THEN CAST(${java.lang.Long.toUnsignedString(1L << b)} AS UBIGINT)" +
        s" ELSE CAST(0 AS UBIGINT) END)"
    }.mkString("(", " + ", ")")
    let(hashes, "hs", let("len(hs)", "ntok", bits))
  }

  val pairsSql: String =
    s"""WITH aug AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
      |  WHERE doc_id % 100 = 0),
      |sims AS (SELECT doc_id, ${simhashExpr("text")} AS sim FROM aug)
      |SELECT a.doc_id AS da, b.doc_id AS db,
      |  CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS hamming
      |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.sim, b.sim)) <= 3
      |ORDER BY da, db""".stripMargin
}

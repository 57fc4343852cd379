package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication operators over `documents`: exact (content-hash groupBy),
  * MinHash+LSH (shingle → minhash → band → bucket self-join → jaccard
  * verify), SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * The source corpus has no duplicates (500/500 distinct md5 at sf0.01), so
  * each query plants deterministic duplicates first — exact copies
  * (doc_id+1_000_000, every 10th doc) and near copies with the first token
  * dropped (doc_id+2_000_000, every 10th doc offset 5) — and must find
  * exactly those.
  *
  * Hashing is the oracle-portable scheme of [[TextAnalysis]]: dictionary
  * ids + affine hashes mod a prime (exact integer arithmetic in Spark and
  * DuckDB alike). At 100 TB swap the dictionary for xxhash64 — the
  * pipeline shape (explode → min-agg → band → self-join on bucket) is
  * unchanged, and that shape is the scalable part: LSH turns the O(n²)
  * pair problem into a per-bucket join.
  */
object Dedup {

  type Q = (SparkSession, String) => DataFrame

  val P = 1000003L // hash modulus (prime)

  /** documents ∪ planted exact copies ∪ planted near copies. */
  def corpusWithCopies(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
    val exact = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val near = base.filter(col("doc_id") % 10 === 5)
      .select((col("doc_id") + 2000000L).as("doc_id"),
              expr("substring(text, instr(text, ' ') + 1)").as("text"))
    base.unionByName(exact).unionByName(near)
  }

  val corpusSql: String =
    """corpus AS (
         SELECT doc_id, text FROM documents
         UNION ALL
         SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
         UNION ALL
         SELECT doc_id + 2000000 AS doc_id,
                substring(text, instr(text, ' ') + 1) AS text
         FROM documents WHERE doc_id % 10 = 5)"""

  /** Distinct word-3-gram shingles per document — a single map-side array
    * transform (no joins, no explode-shuffle until the final distinct).
    * At 100 TB this is the difference between a scan and three shuffles. */
  def shingles(corpus: DataFrame): DataFrame = {
    // tokenize in its OWN projection: expressions inside a higher-order
    // lambda are not CSE'd, so referencing split(...) directly would
    // re-split the text for every array element
    val t = corpus.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    val sh = when(size(col("toks")) >= 3,
      transform(sequence(lit(0), size(col("toks")) - 3),
        i => concat_ws(" ", element_at(col("toks"), i + 1),
                            element_at(col("toks"), i + 2),
                            element_at(col("toks"), i + 3))))
      .otherwise(array())
    t.select(col("doc_id"), explode(array_distinct(sh)).as("shingle"))
  }

  val shinglesSql: String =
    """tok AS (
         SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok,
                unnest(range(0, len(string_split_regex(text, '\s+')))) AS pos
         FROM corpus),
       shingle AS (
         SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
         FROM tok a
         JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2)"""

  /** Shingle dictionary (lexicographic dense ids — oracle-portable). */
  def shingleDict(sh: DataFrame): DataFrame =
    sh.select(col("shingle")).distinct()
      .withColumn("sid", dense_rank().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("shingle"))).cast("long"))

  val shingleDictSql: String =
    """dict AS (
         SELECT shingle, CAST(DENSE_RANK() OVER (ORDER BY shingle) AS BIGINT) AS sid
         FROM (SELECT DISTINCT shingle FROM shingle))"""

  // --- d01: exact dedup -------------------------------------------------

  /** Exact dedup: md5-content groups, canonical = min doc_id. */
  def d01Exact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    corpusWithCopies(Tables.documents(spark, dir))
      .groupBy(md5($"text".cast("binary")).as("content_hash"))
      .agg(min($"doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))
      .filter($"n_copies" > 1)
  }

  // --- d02: MinHash + LSH ----------------------------------------------

  val K = 8 // minhash functions; banded 2-per-band → 4 bands
  def aCoef(i: Int): Long = 37L + 101L * i
  def bCoef(i: Int): Long = 17L + 997L * i

  /** Per-doc minhash signature columns min_0..min_{K-1}. */
  def signatures(shWithIds: DataFrame): DataFrame =
    shWithIds.groupBy(col("doc_id")).agg(
      min((col("sid") * aCoef(0) + bCoef(0)) % P).as("min_0"),
      (1 until K).map(i => min((col("sid") * aCoef(i) + bCoef(i)) % P).as(s"min_$i")): _*)

  /** Verified near-pair set over an arbitrary corpus (dictionary shingle
    * ids — the oracle-portable hashing; see class note). Returns
    * (id1 < id2, inter, n1, n2) for every pair with true jaccard ≥ 0.5.
    * d02 runs it over the planted corpus; d12 over index ∪ incoming. */
  def minHashPairsDict(corpus: DataFrame): DataFrame =
    minHashPairsDictStaged(corpus)._1

  /** [[minHashPairsDict]] exposing its pipeline caches, for callers that
    * materialize the pair set ([[memoMaterialized]]) and release them. */
  private def minHashPairsDictStaged(corpus: DataFrame): (DataFrame, Seq[DataFrame]) = {
    import corpus.sparkSession.implicits._
    val sh = shingles(corpus)
    // cache AFTER the dictionary join: sig, both verify sides, and sizes
    // all reuse (doc_id, sid) — recomputing it would redo the dict join 4×
    val ids = sh.join(shingleDict(sh), "shingle").select($"doc_id", $"sid").cache()
    // sig is referenced by all 4 band projections on BOTH sides of the
    // band self-join — uncached it would be recomputed 8×
    val sig = signatures(ids).cache()
    // band keys: (band index, the band's two signature values)
    val bands = explodeBands(sig, Seq($"doc_id"), (0 until K / 2).map(b =>
      concat_ws(":", col(s"min_${2 * b}"), col(s"min_${2 * b + 1}"))))
    val cand = bands.as("x").join(bands.as("y"),
        $"x.band" === $"y.band" && $"x.bkey" === $"y.bkey" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("id1"), $"y.doc_id".as("id2")).distinct()
    // verify: true shingle jaccard ≥ 0.5 (integer cross-multiplication)
    val sizes = ids.groupBy($"doc_id").agg(count(lit(1)).as("n")).cache() // tiny; read twice
    val inter = cand
      .join(ids.select($"doc_id".as("id1"), $"sid".as("s1")), "id1")
      .join(ids.select($"doc_id".as("id2"), $"sid".as("s2")), "id2")
      .filter($"s1" === $"s2")
      .groupBy($"id1", $"id2").agg(count(lit(1)).as("inter"))
    val pairs = inter
      .join(sizes.select($"doc_id".as("id1"), $"n".as("n1")), "id1")
      .join(sizes.select($"doc_id".as("id2"), $"n".as("n2")), "id2")
      .filter($"inter" * 2 >= ($"n1" + $"n2" - $"inter"))
      .select($"id1", $"id2", $"inter", $"n1", $"n2")
    (pairs, Seq(ids, sig, sizes))
  }

  def d02MinHashLsh(spark: SparkSession, dir: String): DataFrame =
      memoMaterialized(spark, dir, "d02:pairs") {
    import spark.implicits._
    val (pairs, caches) =
      minHashPairsDictStaged(corpusWithCopies(Tables.documents(spark, dir)))
    (pairs.select($"id1", $"id2", $"inter", $"n1", $"n2",
        (($"inter" * 100.0) / ($"n1" + $"n2" - $"inter")).as("jacc_pct")),
      caches)
  }

  /** Scale-path MinHash+LSH: identical pipeline shape to [[d02MinHashLsh]]
    * but shingle ids come from `xxhash64` — no dictionary, no global
    * sort, pure map-side hashing. This is the variant to run on 100 TB;
    * d02's dictionary form exists because DuckDB can replay it exactly.
    * (No oracle by construction — xxhash64 is Spark-specific; the spec
    * asserts it finds the same planted duplicates as d02.) */
  def minHashLshScale(spark: SparkSession, dir: String): DataFrame =
      memoMaterialized(spark, dir, "d06:pairs") {
    import spark.implicits._
    val corpus = corpusWithCopies(Tables.documents(spark, dir))
    val ids = shingles(corpus)
      .select($"doc_id", pmod(xxhash64($"shingle"), lit(P)).as("sid")).cache()
    // cached for the same 8× band-self-join reuse as in d02
    val sig = signatures(ids).cache()
    val bands = explodeBands(sig, Seq($"doc_id"), (0 until K / 2).map(b =>
      concat_ws(":", col(s"min_${2 * b}"), col(s"min_${2 * b + 1}"))))
    val cand = bands.as("x").join(bands.as("y"),
        $"x.band" === $"y.band" && $"x.bkey" === $"y.bkey" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("id1"), $"y.doc_id".as("id2")).distinct()
    val sizes = ids.groupBy($"doc_id").agg(count(lit(1)).as("n")).cache() // tiny; read twice
    val inter = cand
      .join(ids.select($"doc_id".as("id1"), $"sid".as("s1")), "id1")
      .join(ids.select($"doc_id".as("id2"), $"sid".as("s2")), "id2")
      .filter($"s1" === $"s2")
      .groupBy($"id1", $"id2").agg(count(lit(1)).as("inter"))
    val pairs = inter
      .join(sizes.select($"doc_id".as("id1"), $"n".as("n1")), "id1")
      .join(sizes.select($"doc_id".as("id2"), $"n".as("n2")), "id2")
      .filter($"inter" * 2 >= ($"n1" + $"n2" - $"inter"))
      .select($"id1", $"id2", $"inter", $"n1", $"n2")
    (pairs, Seq(ids, sig, sizes))
  }

  /** Shingle ARRAYS (no explode): the whole 3-gram set stays one row per
    * document — the input shape for the map-side [[graft.functions.MinHashSignature]]. */
  def shingleArrays(corpus: DataFrame): DataFrame = {
    val t = corpus.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    val sh = when(size(col("toks")) >= 3,
      transform(sequence(lit(0), size(col("toks")) - 3),
        i => concat_ws(" ", element_at(col("toks"), i + 1),
                            element_at(col("toks"), i + 2),
                            element_at(col("toks"), i + 3))))
      .otherwise(array())
    t.select(col("doc_id"), array_distinct(sh).as("shingles"))
  }

  /** d18: zero-explode LSH near-dup — the plan [[minHashLshScale]] should
    * become at 100 TB. The K-hash signature is ONE codegen'd expression
    * ([[graft.functions.MinHashSignature]]) inside the scan projection, so
    * the corpus-token-scale explode → groupBy shuffle disappears entirely:
    * the first exchange of the whole dedup is the band self-join on
    * ~(4·docs) tiny band-key rows. Candidate verification joins the
    * shingle ARRAYS back for just the candidate ids and intersects them
    * map-side (`array_intersect` on the raw shingles — the TRUE jaccard,
    * immune to the modular-hash collisions the exploded sid-join form can
    * in principle double-count). MinHashSpec asserts bit-identical
    * signatures vs the exploded build and exact pair parity with the
    * oracle-checked dictionary form (d02). */
  def d18MinHashMapSide(spark: SparkSession, dir: String): DataFrame =
    memoMaterialized(spark, dir, "d18:pairs") {
      minHashPairsMapSideStaged(corpusWithCopies(Tables.documents(spark, dir)))
    }

  /** The zero-explode pair pipeline of [[d18MinHashMapSide]] over an
    * arbitrary corpus — d18 runs it on the planted corpus, d22 on
    * index ∪ incoming batch, d10 consumes it for cluster edges.
    * "Zero-explode" means zero SHINGLE explosion (the corpus x
    * shingle-count row blowup); the band projection itself is a
    * constant-4 posexplode since r12 (see [[explodeBands]]).
    * `doCache=false` exists only for plan-shape tests (PlanSpec asserts
    * the no-shingle-Generate guarantee on the uncached plan, which caching would
    * hide inside InMemoryRelation). */
  private[graft] def minHashPairsMapSide(corpus: DataFrame,
                                         doCache: Boolean = true): DataFrame =
    minHashPairsMapSideStaged(corpus, doCache)._1

  /** [[minHashPairsMapSide]] exposing its pipeline caches, for callers
    * that materialize the pair set ([[memoMaterialized]]) and release
    * them afterwards. */
  private[graft] def minHashPairsMapSideStaged(
      corpus: DataFrame, doCache: Boolean = true): (DataFrame, Seq[DataFrame]) = {
    import corpus.sparkSession.implicits._
    def maybeCache(df: DataFrame): DataFrame = if (doCache) df.cache() else df
    // cached: the band build reads it once, the verify join twice
    val sharr = maybeCache(shingleArrays(corpus).filter(size($"shingles") > 0))
    // sig cached too: 4 band projections × 2 self-join sides reference it,
    // and each element_at would otherwise re-run the K-minima expression —
    // the cache pins ONE minhash_sig evaluation per document
    val sig = maybeCache(sharr.select($"doc_id",
      graft.functions.MinHash.minhashSig($"shingles", K, P).as("sig")))
    val bands = explodeBands(sig, Seq($"doc_id"), (0 until K / 2).map(b =>
      concat_ws(":", element_at($"sig", 2 * b + 1),
                     element_at($"sig", 2 * b + 2))))
    val cand = bands.as("x").join(bands.as("y"),
        $"x.band" === $"y.band" && $"x.bkey" === $"y.bkey" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("id1"), $"y.doc_id".as("id2")).distinct()
    val pairs = cand
      .join(sharr.select($"doc_id".as("id1"), $"shingles".as("sh1")), "id1")
      .join(sharr.select($"doc_id".as("id2"), $"shingles".as("sh2")), "id2")
      .select($"id1", $"id2",
        size(array_intersect($"sh1", $"sh2")).cast("long").as("inter"),
        size($"sh1").cast("long").as("n1"),
        size($"sh2").cast("long").as("n2"))
      .filter($"inter" * 2 >= ($"n1" + $"n2" - $"inter"))
    (pairs, if (doCache) Seq(sharr, sig) else Nil)
  }

  /** Corpus-level dedup API: the operational form ("give me the cleaned
    * corpus"). Exact duplicates collapse to the min doc_id; near
    * duplicates (verified jaccard ≥ 0.5 via the scale-path LSH) drop the
    * higher doc_id of each pair. */
  def dedupCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val corpus = corpusWithCopies(Tables.documents(spark, dir))
    // The memoized value is the id-cardinality KEEP set (exact-canon
    // min-ids minus verified near-dup drops) — never the cleaned corpus
    // itself, which is corpus-sized and would violate the memo contract.
    // Before r17 every call re-ran the md5 group-by + both joins even
    // though d18's pair memo was materialized (9.2× best in the r16
    // bench, both passes); now repeat calls pay one semi-join against
    // the checkpointed keep ids.
    val keepIds = memoMaterialized(spark, dir, "d07:keepIds") {
      // near pairs via the zero-explode map-side LSH (d18): MinHashSpec
      // pins its survivor pair set equal to the exploded minHashLshScale
      // path, so the drops are identical — with no corpus-token-scale
      // shuffle
      val nearDrops = d18MinHashMapSide(spark, dir)
        .select($"id2".as("doc_id")).distinct()
      val exactKeeps = corpus
        .groupBy(md5($"text".cast("binary")).as("h"))
        .agg(min($"doc_id").as("doc_id"))
        .select($"doc_id")
      (exactKeeps.join(nearDrops, Seq("doc_id"), "left_anti"), Nil)
    }
    // final join stays LAZY over the corpus — the cleaned corpus is
    // never pinned; doc_id is unique in corpusWithCopies, so the keep-id
    // semi-join selects exactly the rows the canonical-row join did. No
    // broadcast hint: keep ids are O(N) rows (8-byte ids, tiny to PIN
    // but not guaranteed executor-memory-sized at 100 TB) — AQE
    // broadcasts the checkpointed set when its stats allow and shuffles
    // on doc_id otherwise.
    corpus.join(keepIds, Seq("doc_id"), "left_semi")
      .select($"doc_id", $"text")
  }

  // --- d09/d10: cluster assignment (connected components) ---------------

  /** Min-label propagation with pointer doubling: `cluster_id(v)`
    * converges to the smallest doc_id in v's connected component. Each
    * round is (a) one neighbor-min step — hash join on edges + min-agg,
    * the classic MapReduce CC round — and (b) one label-of-label hop
    * (`l ← min(l, label(l))`), which halves every label chain, so
    * convergence is O(log diameter) rounds instead of O(diameter) —
    * organic near-dup chains in a web-scale corpus are NOT shallow, and
    * the doubling is what keeps the round count bounded at 100 TB. The
    * driver-side loop only ever `count()`s a convergence predicate — no
    * row data crosses to the driver. */
  def clusterLabels(nodes: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    // localCheckpoint (not cache) each round: caching keeps the LOGICAL
    // plan growing — with the doubling self-join the plan tree doubles
    // per round and Catalyst's re-analysis goes exponential. Truncating
    // to a LogicalRDD keeps every round's plan flat.
    var labels = nodes.select(col("doc_id"), col("doc_id").as("cluster_id"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val prop = edges.join(labels.withColumnRenamed("doc_id", "src"), "src")
        .select(col("dst").as("doc_id"), col("cluster_id"))
      val viaNeighbors = labels.unionByName(prop)
        .groupBy(col("doc_id")).agg(min(col("cluster_id")).as("cluster_id"))
        .localCheckpoint()
      // pointer doubling: every label value is itself a node, so the
      // lookup join is total and keeps one row per doc
      val next = viaNeighbors.as("a")
        .join(viaNeighbors.select(col("doc_id").as("lbl"), col("cluster_id").as("ll")).as("b"),
              col("a.cluster_id") === col("b.lbl"))
        .select(col("a.doc_id").as("doc_id"),
                least(col("a.cluster_id"), col("ll")).as("cluster_id"))
        .localCheckpoint()
      // labels only ever decrease; fixpoint = no decrease anywhere
      val changed = next
        .join(labels.withColumnRenamed("cluster_id", "prev"), "doc_id")
        .filter(col("cluster_id") < col("prev")).count()
      labels = next
      converged = changed == 0
      i += 1
    }
    labels
  }

  /** Exact-duplicate pairs (canonical = min doc_id of each md5 group). */
  private def exactPairs(corpus: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text").cast("binary")))
    corpus
      .select(col("doc_id"), min(col("doc_id")).over(w).as("canon"))
      .filter(col("doc_id") =!= col("canon"))
      .select(col("canon").as("id1"), col("doc_id").as("id2"))
  }

  private def clustersOver(corpus: DataFrame, nearPairs: DataFrame): (DataFrame, Seq[DataFrame]) = {
    val pairs = nearPairs.unionByName(exactPairs(corpus))
    // cache: every propagation round joins `edges`; uncached, each round
    // would re-run the whole LSH candidate/verify pipeline behind it
    val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
      .unionByName(pairs.select(col("id2").as("src"), col("id1").as("dst")))
      .distinct().cache()
    val labels = clusterLabels(corpus.select(col("doc_id")).distinct(), edges)
    val sizes = labels.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
    // the memo materializes this labeling (label-cardinality) and then
    // releases `edges` — d19/d20 (keep-policy) read the pinned rows
    (labels.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size")),
      Seq(edges))
  }

  /** Session-scoped labeling memo. The propagation in [[clusterLabels]]
    * is EAGER — its convergence loop runs jobs at DataFrame-construction
    * time — so Spark's CacheManager plan-matching (which round 6 relied
    * on) cannot stop a second caller from re-running the whole
    * propagation: the loop fires before the cached result is ever
    * consulted. Memoizing the labeling per (session, corpus dir, hash
    * family) makes it what it is in production: a cluster-assignment
    * table materialized once per corpus, read by the keep-policy, the
    * corpus dedup, and any downstream curation. Inputs are immutable
    * parquet, so the memo can never go stale within a session.
    *
    * Keyed by the session OBJECT (reference equality — no
    * identity-hash-collision risk), computed under a lock (two
    * concurrent first callers must not both run the eager propagation),
    * and entries of stopped sessions are evicted on every access so a
    * dead session's DataFrames are never served and never pinned past
    * the next memoized call. Shared by the cluster labelings (eager
    * propagation) and the d17/d21 banding sweeps (three consumers per
    * config over the same cached candidates — the memo makes repeat
    * calls in one JVM return the already-cached 2-row report instead of
    * re-running both band joins). Since r10 also shared (`private[ext]`)
    * with Similarity's cache-carrying entries (s14/s18/s20), so repeated
    * registry runs in one JVM REUSE their cached intermediates instead
    * of stacking fresh unreachable cached relations per call. */
  private val dfMemo =
    scala.collection.mutable.HashMap.empty[(SparkSession, String, String), DataFrame]

  private[ext] def memoDf(spark: SparkSession, dir: String, key: String)(
      compute: => DataFrame): DataFrame = dfMemo.synchronized {
    dfMemo.keys.filter(_._1.sparkContext.isStopped).toList
      .foreach(dfMemo.remove)
    dfMemo.getOrElseUpdate((spark, dir, key), compute)
  }

  /** [[memoDf]] with p01's materialization contract (Curation.scala): the
    * memoized value is the MATERIALIZED result (eager `localCheckpoint`),
    * never a plan over pipeline `.cache()`s, and those caches are RELEASED
    * once the checkpoint lands. A memoized PLAN is only fast while the
    * LRU keeps its pipeline caches alive — across a 280-entry battery the
    * storage churn evicts them and every repeat action silently re-runs
    * the band joins (the r14 p01 regression, generalized: r15's
    * d21/d22/d24/d26 were the same disease). Every value memoized this
    * way is pair/cell/label/report-cardinality — tiny relative to the
    * corpus at any scale — so pinning its ROWS is O(result) forever while
    * pinning nothing of the pipeline. `compute` returns the result plan
    * plus the pipeline caches that existed only to keep the ONE
    * materialization from recomputing shared stages. */
  private[ext] def memoMaterialized(spark: SparkSession, dir: String, key: String)(
      compute: => (DataFrame, Seq[DataFrame])): DataFrame =
    memoDf(spark, dir, key) {
      val (result, pipelineCaches) = compute
      val out = result.localCheckpoint(true)
      pipelineCaches.foreach(_.unpersist())
      out
    }

  /** One (band, bkey) row per input row per band as a SINGLE projection
    * (`posexplode` over the per-band key array) instead of a
    * branch-per-band union: an N-way union of the same (often cached)
    * input re-scans it once PER BRANCH per action, and r12 profiling
    * measured the union-form band aggregates 3-5x slower than this form
    * on identical rows. `keep` columns ride along unchanged; `band` is
    * the key's position, exactly the old `lit(b)`. */
  private[graft] def explodeBands(df: DataFrame, keep: Seq[Column],
                                  keys: Seq[Column]): DataFrame =
    df.select(keep :+ posexplode(array(keys: _*)).as(Seq("band", "bkey")): _*)

  /** Dedup cluster assignment: every corpus document labeled with the min
    * doc_id of its duplicate component (exact-dup edges ∪ verified LSH
    * near-dup edges), plus the component size. Oracle replays the
    * propagation as a recursive reachability walk. */
  def d09DedupClusters(spark: SparkSession, dir: String): DataFrame =
    memoMaterialized(spark, dir, "labels:dict") {
      import spark.implicits._
      val corpus = corpusWithCopies(Tables.documents(spark, dir))
      clustersOver(corpus, d02MinHashLsh(spark, dir).select($"id1", $"id2"))
    }

  /** Scale-path twin of [[d09DedupClusters]]: near-dup edges from the
    * zero-explode xxhash64 pipeline of [[d18MinHashMapSide]] (no
    * dictionary; TRUE jaccard on raw shingle arrays — immune to the
    * mod-P sid collisions the exploded verify can hit at real corpus
    * scale, and the SAME pair set d07's drops come from, so the scale
    * path's clusters and its corpus dedup can never disagree).
    * Oracle-exact since r9 via the banding-independent all-pairs
    * true-jaccard device ([[exactNearCtesFor]] + the recursive
    * reachability walk); ExtSpec additionally asserts cluster parity
    * with d09. */
  def dedupClustersScale(spark: SparkSession, dir: String): DataFrame =
    memoMaterialized(spark, dir, "labels:scale") {
      import spark.implicits._
      val corpus = corpusWithCopies(Tables.documents(spark, dir))
      clustersOver(corpus, d18MinHashMapSide(spark, dir).select($"id1", $"id2"))
    }

  /** d13: semantic dedup clusters — connected components over the
    * embedding near-dup graph (the verified cosine ≥ 0.5 pairs of d05)
    * instead of the text-shingle graph of d09: the "same meaning,
    * different words" dedup a training pipeline layers on top of lexical
    * LSH. Same label-propagation machinery ([[clusterLabels]], pointer
    * doubling, O(log diameter) rounds); each cluster is labeled by its
    * min vec_id, which is also the kept representative. */
  def d13SemanticClusters(spark: SparkSession, dir: String): DataFrame =
      memoMaterialized(spark, dir, "d13:clusters") {
    import spark.implicits._
    val ids = Tables.embeddings(spark, dir).select($"vec_id")
    val nodes = ids
      .unionByName(ids.filter($"vec_id" % 20 === 0).select(($"vec_id" + 100000L).as("vec_id")))
      .unionByName(ids.filter($"vec_id" % 20 === 10).select(($"vec_id" + 200000L).as("vec_id")))
      .select($"vec_id".as("doc_id"))
    val pairs = d05EmbeddingNearDup(spark, dir).select($"id1", $"id2")
    // cache: every propagation round re-joins the edge set — uncached it
    // would re-run the cosine verification behind it per round
    val edges = pairs.select($"id1".as("src"), $"id2".as("dst"))
      .unionByName(pairs.select($"id2".as("src"), $"id1".as("dst")))
      .distinct().cache()
    val labels = clusterLabels(nodes, edges)
    val sizes = labels.groupBy($"cluster_id").agg(count(lit(1)).as("cluster_size"))
    (labels.join(sizes, "cluster_id")
      .select($"doc_id".as("vec_id"), $"cluster_id", $"cluster_size",
        ($"doc_id" === $"cluster_id").as("is_representative")),
      Seq(edges))
  }

  /** d19: keep-BEST canonical selection — the dedup keep-policy knob.
    * d07/d09 keep the min doc_id per duplicate cluster (stable, cheap);
    * a curation run usually wants the best DOCUMENT instead: per d09
    * cluster, the member with the highest t03 quality (doc_id tie-break)
    * survives. Near copies genuinely differ in text, so the policy picks
    * differently than min-id. One join of cluster labels to a map-side
    * quality projection + a cluster-keyed argmax window over dup
    * clusters only — the policy change costs one window over the (tiny)
    * duplicate subset, not a re-run of the LSH. */
  def d19KeepBestDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    keepBestOver(corpusWithCopies(Tables.documents(spark, dir)),
      d09DedupClusters(spark, dir))
  }

  /** d20: [[d19KeepBestDedup]]'s policy over the SCALE labels (d10's
    * xxhash64/zero-explode clustering) — the form a 100 TB run executes:
    * no shingle dictionary, no global sort anywhere in the plan
    * (PlanSpec-guarded). Oracle-exact since r9 via the exact all-pairs
    * true-jaccard pair set ([[exactNearCtesFor]]): the two hash families
    * band borderline near pairs differently (measured at sf0.01:
    * xxhash64 finds one true near pair, (275, 2000275), that the
    * dictionary banding misses), so d10/d20 could never share d09/d19's
    * BANDED oracles — but both pipelines verify TRUE jaccard, so against
    * the banding-free exact pair set the oracle pins them precisely
    * (and re-proves the map-side banding's full recall each round). */
  def d20KeepBestScale(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    keepBestOver(corpusWithCopies(Tables.documents(spark, dir)),
      dedupClustersScale(spark, dir))
  }

  /** The keep-best policy body shared by d19 (dictionary labels) and d20
    * (scale labels): per duplicate cluster, the member with the highest
    * t03-style quality (doc_id tie-break) survives. One join of cluster
    * labels to a map-side quality projection + a cluster-keyed argmax
    * window over dup clusters only. */
  private def keepBestOver(corpus: DataFrame, clusters: DataFrame): DataFrame = {
    import corpus.sparkSession.implicits._
    val toks = TextAnalysis.tokens($"text")
    val stopArr = array(TextAnalysis.stopwords.map(lit): _*)
    val quality = corpus.select($"doc_id",
      ((size(array_distinct(toks)) * 1000
        + size(filter(toks, t => array_contains(stopArr, t))) * 100
        - length(regexp_replace($"text", "[a-z\\s]", "")) * 10).cast("double")
        / size(toks)).as("quality"))
    val dupClusters = clusters.filter($"cluster_size" > 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"cluster_id").orderBy($"quality".desc, $"doc_id")
    dupClusters.join(quality, "doc_id")
      .withColumn("rn", row_number().over(w))
      .select($"doc_id", $"cluster_id", $"cluster_size", $"quality",
        ($"rn" === 1).as("is_kept"))
  }

  // --- d03: SimHash -----------------------------------------------------

  val SimBits = 16

  /** Per-bit hash constants. The multiplier must push (sid + aOff)·mult
    * well past P so the mod actually mixes: dictionary sids are dense
    * ranks, and with a small coefficient `sid·c < P` the residue IS the
    * product and its parity collapses to parity(sid) for every odd c —
    * all bits vote identically and the fingerprint saturates (found when
    * d23's pairing put 40% of all pairs within hamming 3). */
  def simAOff(b: Int): Long = 7L + 131L * b
  def simMult(b: Int): Long = 2605053L + 104729L * b

  /** SimHash bit-vote over (doc_id, sid) pairs: one map-side ±1 vote per
    * bit per shingle, a single groupBy, sign-pack. `bits` ≤ 62 so the
    * packed value stays a positive long in both engines. */
  private[graft] def simHashFrom(ids: DataFrame, bits: Int = SimBits): DataFrame = {
    def bitVote(b: Int): Column =
      sum(when((((col("sid") + simAOff(b)) * simMult(b)) % P) % 2 === 1, 1)
        .otherwise(-1)).as(s"bs_$b")
    val bitSums = ids.groupBy(col("doc_id")).agg(
      bitVote(0), (1 until bits).map(bitVote): _*)
    val simhash = (0 until bits).map(b =>
      when(col(s"bs_$b") > 0, 1L << b).otherwise(0L)).reduce(_ + _)
    bitSums.select(col("doc_id"), simhash.as("simhash"))
  }

  def d03SimHash(spark: SparkSession, dir: String): DataFrame =
      memoMaterialized(spark, dir, "d03:fp") {
    import spark.implicits._
    // memoized MATERIALIZED (r16): d03's repeat cost used to ride d02's
    // ids cache via CacheManager plan-matching; with that cache released
    // by d02's materializing memo, d03 pins its own (doc-cardinality)
    // fingerprint rows instead of re-running the dictionary sort
    val corpus = corpusWithCopies(Tables.documents(spark, dir))
    val sh = shingles(corpus)
    (simHashFrom(sh.join(shingleDict(sh), "shingle").select($"doc_id", $"sid")), Nil)
  }

  /** Scale-path SimHash: identical bit-vote pipeline to [[d03SimHash]] but
    * shingle ids from `xxhash64` — no dictionary, no global sort. Pure
    * map + one groupBy at any corpus size. (No oracle — xxhash64 is
    * Spark-specific; ExtSpec asserts it finds the planted structure.) */
  def simHashScale(spark: SparkSession, dir: String): DataFrame =
      memoMaterialized(spark, dir, "d08:fp") {
    import spark.implicits._
    val corpus = corpusWithCopies(Tables.documents(spark, dir))
    (simHashFrom(shingles(corpus)
      .select($"doc_id", pmod(xxhash64($"shingle"), lit(P)).as("sid"))), Nil)
  }

  /** d25: zero-explode SimHash — the plan [[simHashScale]] should become
    * at 100 TB, and the SimHash twin of d18's minhash story: the whole
    * fingerprint is ONE codegen'd expression
    * ([[graft.functions.SimHashSignature]]) inside the scan projection,
    * so the corpus-token-scale explode → groupBy vote shuffle disappears
    * and the fingerprint pass has NO exchange at all (PlanSpec-guarded).
    * SimHashExprSpec pins bit-identical fingerprints vs the exploded
    * xxhash64 build. Rows-only (xxhash64 has no DuckDB twin). */
  def d25SimHashMapSide(spark: SparkSession, dir: String): DataFrame =
      memoMaterialized(spark, dir, "d25:fp") {
    import spark.implicits._
    // memoized MATERIALIZED (r16): d25's repeat cost used to plan-match
    // d18's shingle-array cache — released since the memo generalization
    val corpus = corpusWithCopies(Tables.documents(spark, dir))
    (shingleArrays(corpus).filter(size($"shingles") > 0)
      .select($"doc_id",
        graft.functions.SimHash.simhashSig($"shingles", SimBits, P).as("simhash")),
      Nil)
  }

  // --- d23: SimHash hamming near-dup (banded pairing) -------------------

  /** Bit width for d23's pairing fingerprint; 4 bands × 8 bits. */
  val SimPairBits = 32

  /** Bit width for the SCALE pairing fingerprint (d26): 4 bands × 16
    * bits. The band-key space is the scale knob of pigeonhole pairing —
    * an 8-bit band has 256 possible keys, so at N docs the band
    * self-join degenerates toward Θ(N²/256) candidates per band no
    * matter how good the hash is; 16-bit bands give 65,536 keys/band
    * (256× fewer per-bucket collisions) with the SAME hamming≤3
    * pigeonhole guarantee (3 flips cannot touch all 4 bands). This is
    * the Manku et al. WWW'07 64-bit web-dedup form exactly. */
  val SimPairBitsWide = 64

  /** d23: SimHash near-dup DETECTION — d03 computes fingerprints, this
    * pairs them. Pigeonhole banding: a 32-bit simhash split into 4
    * disjoint 8-bit bands; any two hashes within hamming distance 3
    * differ in ≤3 bits, which cannot touch all 4 bands, so they collide
    * exactly on at least one band key. Candidates come from 4 band
    * equi-self-joins (256 keys per band — never all pairs), verification
    * is ONE integer op (`bit_count(s1 xor s2) ≤ 3`). This is the Google
    * web-dedup shape (Manku et al., WWW'07) at 32 bits — kept as the
    * oracle-exact dictionary form; the SCALE form is
    * [[d26SimHashNearDupScale]], the full 64-bit fingerprint with
    * 4×16-bit bands (65,536 keys/band), because 8-bit band keys cap at
    * 256 buckets and go quadratic as the corpus grows. Dictionary sids
    * keep this one DuckDB-replayable (d08 is the registered xxhash64
    * fingerprint twin). */
  def d23SimHashNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val corpus = corpusWithCopies(Tables.documents(spark, dir))
    val sh = shingles(corpus)
    val sims = simHashFrom(
      sh.join(shingleDict(sh), "shingle").select($"doc_id", $"sid"),
      SimPairBits).cache()
    val bands = explodeBands(sims, Seq($"doc_id"), (0 until 4).map(b =>
      shiftright($"simhash", 8 * b).bitwiseAND(lit(255L))))
    val cand = bands.as("x").join(bands.as("y"),
        $"x.band" === $"y.band" && $"x.bkey" === $"y.bkey" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("id1"), $"y.doc_id".as("id2")).distinct()
    cand
      .join(sims.select($"doc_id".as("id1"), $"simhash".as("s1")), "id1")
      .join(sims.select($"doc_id".as("id2"), $"simhash".as("s2")), "id2")
      .withColumn("hamming", expr("bit_count(s1 ^ s2)"))
      .filter($"hamming" <= 3)
      .select($"id1", $"id2", $"s1", $"s2", $"hamming")
  }

  /** d26: scale twin of [[d23SimHashNearDup]] — pigeonhole pairing over
    * the zero-explode [[graft.functions.SimHashSignature]] fingerprint
    * instead of the dictionary vote build: no global sort, no Generate
    * anywhere, and the FIRST exchange of the whole dedup is the tiny
    * band self-join (one row per doc per band) — the d18 story applied
    * to SimHash. Widened to the full [[SimPairBitsWide]] = 64-bit
    * fingerprint with 4×16-bit bands: r07's 8-bit band keys (256
    * possible values) were the one quadratic-at-scale plan in the repo —
    * every band bucket held N/256 docs regardless of content, so
    * candidate volume grew Θ(N²/256) per band; 65,536-key bands keep
    * the same hamming≤3 completeness guarantee with 256× fewer
    * per-bucket collisions. Rows-only (xxhash64 has no DuckDB twin);
    * Round7Spec pins the planted structure and the brute-force
    * hamming≤3 completeness. */
  def d26SimHashNearDupScale(spark: SparkSession, dir: String): DataFrame =
      memoMaterialized(spark, dir, "d26:pairs") {
    simHashPairsWideStaged(corpusWithCopies(Tables.documents(spark, dir)))
  }

  /** The zero-explode wide-fingerprint pair pipeline of
    * [[d26SimHashNearDupScale]], exposing its pipeline caches for the
    * materializing memo. `doCache=false` exists only for plan-shape tests
    * (Round7Spec asserts the posexplode-only Generate guarantee on the
    * uncached plan, which caching — let alone the memo's checkpoint —
    * would hide). */
  private[graft] def simHashPairsWideStaged(
      corpus: DataFrame, doCache: Boolean = true): (DataFrame, Seq[DataFrame]) = {
    import corpus.sparkSession.implicits._
    def maybeCache(df: DataFrame): DataFrame = if (doCache) df.cache() else df
    val sims = maybeCache(shingleArrays(corpus).filter(size($"shingles") > 0)
      .select($"doc_id",
        graft.functions.SimHash.simhashSig($"shingles", SimPairBitsWide, P).as("simhash")))
    val bands = explodeBands(sims, Seq($"doc_id"), (0 until 4).map(b =>
      shiftright($"simhash", 16 * b).bitwiseAND(lit(65535L))))
    val cand = bands.as("x").join(bands.as("y"),
        $"x.band" === $"y.band" && $"x.bkey" === $"y.bkey" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("id1"), $"y.doc_id".as("id2")).distinct()
    val pairs = cand
      .join(sims.select($"doc_id".as("id1"), $"simhash".as("s1")), "id1")
      .join(sims.select($"doc_id".as("id2"), $"simhash".as("s2")), "id2")
      .withColumn("hamming", expr("bit_count(s1 ^ s2)"))
      .filter($"hamming" <= 3)
      .select($"id1", $"id2", $"s1", $"s2", $"hamming")
    (pairs, if (doCache) Seq(sims) else Nil)
  }

  // --- d04: n-gram Jaccard on planted pairs ----------------------------

  /** Jaccard over 3-gram shingles for constructed pair lists: exact pairs,
    * near pairs, and unrelated control pairs. */
  def d04NgramJaccard(spark: SparkSession, dir: String): DataFrame =
      memoMaterialized(spark, dir, "d04:pairs") {
    import spark.implicits._
    val corpus = corpusWithCopies(Tables.documents(spark, dir))
    val sh = shingles(corpus)
    val ids = sh.join(shingleDict(sh), "shingle").select($"doc_id", $"sid").cache()
    val base = Tables.documents(spark, dir).select($"doc_id")
    val pairs =
      base.filter($"doc_id" % 10 === 0).select($"doc_id".as("id1"), ($"doc_id" + 1000000L).as("id2"), lit("exact").as("kind"))
        .unionByName(base.filter($"doc_id" % 10 === 5).select($"doc_id".as("id1"), ($"doc_id" + 2000000L).as("id2"), lit("near").as("kind")))
        .unionByName(base.filter($"doc_id" % 10 === 0 && $"doc_id" % 20 === 0)
          .select($"doc_id".as("id1"), ($"doc_id" + 5).as("id2"), lit("control").as("kind")))
    val sizes = ids.groupBy($"doc_id").agg(count(lit(1)).as("n")).cache() // tiny; read twice
    val inter = pairs
      .join(ids.select($"doc_id".as("id1"), $"sid".as("s1")), "id1")
      .join(ids.select($"doc_id".as("id2"), $"sid".as("s2")), "id2")
      .filter($"s1" === $"s2")
      .groupBy($"id1", $"id2").agg(count(lit(1)).as("inter"))
    (pairs
      .join(inter, Seq("id1", "id2"), "left")
      .na.fill(0L, Seq("inter"))
      .join(sizes.select($"doc_id".as("id1"), $"n".as("n1")), "id1")
      .join(sizes.select($"doc_id".as("id2"), $"n".as("n2")), "id2")
      .select($"kind", $"id1", $"id2", $"inter", $"n1", $"n2",
        (($"inter" * 100.0) / ($"n1" + $"n2" - $"inter")).as("jacc_pct")),
      Seq(ids, sizes))
  }

  // --- d05: embedding-cosine near-dup ----------------------------------

  /** Embeddings ∪ exact copies (vec_id+100_000, every 20th) ∪ sign-flipped
    * first-component copies (vec_id+200_000, every 20th offset 10). Scores
    * planted pairs with exact-decimal dot products. */
  def d05EmbeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val aug = e
      .unionByName(e.filter($"vec_id" % 20 === 0)
        .select(($"vec_id" + 100000L).as("vec_id"), $"embedding"))
      .unionByName(e.filter($"vec_id" % 20 === 10)
        .select(($"vec_id" + 200000L).as("vec_id"),
          concat(array(-element_at($"embedding", 1)), slice($"embedding", 2, 63)).as("embedding")))
    val pairs = e.filter($"vec_id" % 20 === 0)
        .select($"vec_id".as("id1"), ($"vec_id" + 100000L).as("id2"), lit("exact").as("kind"))
      .unionByName(e.filter($"vec_id" % 20 === 10)
        .select($"vec_id".as("id1"), ($"vec_id" + 200000L).as("id2"), lit("flip").as("kind")))
    val withVecs = pairs
      .join(aug.select($"vec_id".as("id1"), $"embedding".as("e1")), "id1")
      .join(aug.select($"vec_id".as("id2"), $"embedding".as("e2")), "id2")
    withVecs.select($"kind", $"id1", $"id2",
        Similarity.cosine($"e1", $"e2").as("cos_sim"))
      .filter($"cos_sim" >= 0.5)
  }

  // --- d24: SemDeDup (semantic dedup within IVF cells) --------------------

  /** Cosine threshold above which two same-cell vectors are semantic
    * duplicates (SemDeDup's ε; exact copies score 1.0, the planted
    * sign-flip near copies ≈ 1 − 2·e₁²/‖e‖², organic pairs ≤ ~0.5). */
  val SemTau = 0.8

  /** d24: SemDeDup — the Abbas et al. 2023 recipe for semantic dedup at
    * corpus scale: cluster the embedding space coarsely, then dedup by
    * pairwise cosine WITHIN each cluster only, keeping one
    * representative (min vec_id here). Within-cell work is Σ|cell|²
    * (one equi-join on the cell id), never N² — the same bounding device
    * as the s14 kNN graph, and the semantic complement of lexical LSH:
    * it drops "same meaning, different words" copies that share no
    * shingles. Uses d05's planted fixture (exact + sign-flip copies over
    * the real embeddings); a dropped vector reports its blocker — the
    * smallest-id same-cell vector above the threshold. Cross-cell
    * duplicates are deliberately missed (the known SemDeDup
    * approximation; more/raised probes are the recall knob). */
  def d24SemDedup(spark: SparkSession, dir: String): DataFrame =
      memoMaterialized(spark, dir, "d24:cells") {
    semDedupStaged(spark, dir)
  }

  /** [[d24SemDedup]]'s pipeline, exposing the cached IVF assignment for
    * the materializing memo (PlanSpec asserts the within-cell equi-join
    * shape on this plan — the memo's checkpoint would hide it). */
  private[graft] def semDedupStaged(spark: SparkSession, dir: String): (DataFrame, Seq[DataFrame]) = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val aug = e
      .unionByName(e.filter($"vec_id" % 20 === 0)
        .select(($"vec_id" + 100000L).as("vec_id"), $"embedding"))
      .unionByName(e.filter($"vec_id" % 20 === 10)
        .select(($"vec_id" + 200000L).as("vec_id"),
          concat(array(-element_at($"embedding", 1)), slice($"embedding", 2, 63)).as("embedding")))
    // cache: the assignment (centroid broadcast + per-vector argmax) is
    // referenced three times — both pair sides and the disposition read
    val assigned = Similarity.ivfAssigned(aug).cache()
    val blockers = assigned.as("a").join(assigned.as("b"), "cid")
      .filter($"a.vec_id" < $"b.vec_id" &&
        Similarity.cosine($"a.embedding", $"b.embedding") >= SemTau)
      .groupBy($"b.vec_id".as("vec_id"))
      .agg(min($"a.vec_id").as("blocker_id"))
    (assigned.select($"vec_id", $"cid")
      .join(blockers, Seq("vec_id"), "left")
      .select($"vec_id", $"cid", $"blocker_id".isNull.as("is_kept"), $"blocker_id"),
      Seq(assigned))
  }

  // --- d11: benchmark contamination --------------------------------------

  /** Benchmark-contamination check (the eval-leakage gate every training
    * corpus needs): flag documents sharing ≥20% of their word-3-gram
    * shingles with a held-out benchmark set (here: every 97th source doc).
    * The benchmark shingle set is tiny relative to the corpus, so it
    * BROADCASTS — the check is one scan of corpus shingles + a map-side
    * hash lookup, no self-join, at any corpus size. Planted copies of
    * benchmark docs must come back contaminated. */
  def d11Contamination(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val benchShingles = shingles(docs.filter($"doc_id" % 97 === 0))
      .select($"shingle").distinct().withColumn("hit", lit(1))
    shingles(corpusWithCopies(docs))
      .filter(!($"doc_id" % 97 === 0 && $"doc_id" < 1000000L)) // benchmark itself excluded
      .join(broadcast(benchShingles), Seq("shingle"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"), count($"hit").as("n_shared"))
      .withColumn("contaminated", $"n_shared" * 5 >= $"n_shingles" && $"n_shared" > 0)
  }

  /** Contamination at corpus scale: the same gate as d11, but the
    * benchmark set is summarized as a BLOOM FILTER (`bloom_filter_agg`,
    * [[graft.functions.Sketches]]) instead of broadcast as an exact hash
    * relation. The bitset is a few hundred KB for millions of benchmark
    * shingles — the sketch hop to the driver is sketch-sized at any
    * corpus size (the `stat.bloomFilter` shape) — so the probe is a pure
    * map-side codegen'd filter, and only the tiny might-contain survivor
    * set reaches the verification join. Bloom filters admit false
    * POSITIVES only, and every candidate is exact-verified, so the
    * output is row-identical to d11 — same oracle, by construction. */
  def d28BloomContamination(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.Sketches.register(spark)
    val docs = Tables.documents(spark, dir)
    val bench = shingles(docs.filter($"doc_id" % 97 === 0))
      .select($"shingle").distinct()
    val bf = bench
      .agg(expr("bloom_filter_agg(xxhash64(shingle), 100000L, 800000L)"))
      .head().getAs[Array[Byte]](0)
    val corpus = shingles(corpusWithCopies(docs))
      .filter(!($"doc_id" % 97 === 0 && $"doc_id" < 1000000L))
    // map-side probe of the constant sketch; empty benchmark ⇒ no bloom
    // ⇒ no candidates (d11 degenerates identically)
    //
    // NOTE (r19, measured): folding the probe into a per-doc
    // collect_list agg (one shingle pass for both counts and
    // candidates) does NOT share the pass — column pruning splits the
    // two consumers into a count HashAggregate and a collect_list
    // ObjectHashAggregate over separate Generates, so the corpus was
    // still shingled twice plus the object-agg cost (1.58 → 2.34 s).
    // The two direct passes are kept: the candidate path is a pure
    // map-side filter (no agg), the count path collapses map-side.
    val candidates =
      if (bf == null) corpus.limit(0)
      else corpus.filter(
        call_function("might_contain", lit(bf), xxhash64($"shingle")))
    // exact verify of the survivors: false positives die, nothing true is
    // lost (no false negatives) — hits are exactly d11's hits
    val hits = candidates.join(bench, Seq("shingle"))
      .groupBy($"doc_id").agg(count(lit(1)).as("n_hits"))
    corpus.groupBy($"doc_id").agg(count(lit(1)).as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .select($"doc_id", $"n_shingles",
        coalesce($"n_hits", lit(0L)).as("n_shared"))
      .withColumn("contaminated", $"n_shared" * 5 >= $"n_shingles" && $"n_shared" > 0)
  }

  /** d11's DuckDB oracle, shared verbatim with d28 (whose bloom
    * prefilter is exact-verified, so its output is d11's by design). */
  private val contaminationSql: String =
    s"""WITH $corpusSql,
        $shinglesSql,
        bench AS (
          SELECT DISTINCT shingle FROM shingle
          WHERE doc_id % 97 = 0 AND doc_id < 1000000),
        ev AS (
          SELECT doc_id, shingle FROM shingle
          WHERE NOT (doc_id % 97 = 0 AND doc_id < 1000000))
        SELECT e.doc_id, COUNT(*) AS n_shingles,
               COUNT(b.shingle) AS n_shared,
               (COUNT(b.shingle) * 5 >= COUNT(*) AND COUNT(b.shingle) > 0) AS contaminated
        FROM ev e LEFT JOIN bench b USING (shingle)
        GROUP BY e.doc_id"""

  // --- d17: LSH banding-configuration sweep --------------------------------

  /** Candidate pairs for a (bands, rows-per-band) split of the K-minhash
    * signature — the tunable at the heart of LSH: more bands ⇒ higher
    * recall, lower precision (the s-curve moves left). */
  def lshCandidates(sig: DataFrame, b: Int, r: Int): DataFrame = {
    require(b * r == K, s"banding $b x $r must tile the $K-hash signature")
    val bands = explodeBands(sig, Seq(col("doc_id")), (0 until b).map(i =>
      concat_ws(":", (0 until r).map(j => col(s"min_${i * r + j}")): _*)))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2")).distinct()
  }

  /** LSH tuning sweep: the same K=8 signature banded as 4×2 and 2×4,
    * with per-config candidate volume, verified-near precision, and
    * recall over the planted pairs — the measurement that picks a
    * banding before a corpus-scale dedup run (d15 evaluates the
    * estimator; this evaluates the INDEX built from it). Each config is
    * band self-join + candidate-only verification (never all pairs);
    * the report is a union of 1-row aggregates. */
  def d17LshTuning(spark: SparkSession, dir: String): DataFrame =
    memoMaterialized(spark, dir, "sweep:dict") {
      import spark.implicits._
      val corpus = corpusWithCopies(Tables.documents(spark, dir))
      val sh = shingles(corpus)
      lshTuningOver(spark, dir,
        sh.join(shingleDict(sh), "shingle").select($"doc_id", $"sid"))
    }

  /** Dictionary-free shingle id from an md5 prefix (mod [[P]]) — the g01
    * portable-hash device (Workload.h32): pure map-side, no global
    * dictionary, and — unlike xxhash64 — byte-identical in DuckDB
    * (`CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT) % P`), so a
    * pipeline built on it can be hash-compared end-to-end, banding
    * included. */
  def sidPortable(shingle: Column): Column =
    pmod(conv(substring(md5(shingle.cast("binary")), 1, 8), 16, 10).cast("long"), lit(P))

  /** d21: [[d17LshTuning]]'s banding sweep on dictionary-free map-side
    * shingle ids — the form a corpus-scale tuning run executes (no
    * global id dictionary; the only shuffles are the per-config band
    * joins and the signature groupBy). Since r10 the id family is the
    * portable [[sidPortable]] md5-prefix hash rather than xxhash64,
    * which keeps the map-side/dictionary-free shape IDENTICAL while
    * making every readout column — banding-specific candidate counts
    * included — replayable in DuckDB: the sweep is now oracle-exact
    * instead of rows-only (VERDICT r09 demand #5). At a real 100 TB run
    * xxhash64 would be the cheaper per-shingle hash; swapping the one
    * `sid` projection back is the only change, and d06/d18/d22 keep
    * exercising exactly that family. Round7Spec pins the sweep's
    * structure against d17's dictionary sweep. */
  def d21LshTuningScale(spark: SparkSession, dir: String): DataFrame =
    memoMaterialized(spark, dir, "sweep:scale") {
      import spark.implicits._
      val corpus = corpusWithCopies(Tables.documents(spark, dir))
      lshTuningOver(spark, dir,
        shingles(corpus).select($"doc_id", sidPortable($"shingle").as("sid")))
    }

  /** The (bands × rows) sweep body shared by d17 (dictionary ids) and
    * d21 (portable md5-prefix ids): per config, band self-join candidates, sid-join
    * verification, and precision/recall over the planted pairs. */
  private def lshTuningOver(spark: SparkSession, dir: String,
                            rawIds: DataFrame): (DataFrame, Seq[DataFrame]) = {
    import spark.implicits._
    val ids = rawIds.cache()
    val sig = signatures(ids).cache()
    val cands = scala.collection.mutable.ListBuffer.empty[DataFrame]
    val sizes = ids.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val base = Tables.documents(spark, dir).select($"doc_id")
    val planted = base.filter($"doc_id" % 10 === 0)
        .select($"doc_id".as("id1"), ($"doc_id" + 1000000L).as("id2"))
      .unionByName(base.filter($"doc_id" % 10 === 5)
        .select($"doc_id".as("id1"), ($"doc_id" + 2000000L).as("id2")))
    val nPlanted = planted.agg(count(lit(1)).as("n_planted"))
    val report = Seq((4, 2), (2, 4)).map { case (b, r) =>
      // cand feeds THREE consumers (its own count, the verify join, the
      // planted-recall semi-join): uncached, the band self-join would run
      // 3x per config — 6x per sweep. Candidate sets are pair-id-sized.
      val cand = lshCandidates(sig, b, r).cache()
      cands += cand
      val verified = cand
        .join(ids.select($"doc_id".as("id1"), $"sid".as("s1")), "id1")
        .join(ids.select($"doc_id".as("id2"), $"sid".as("s2")), "id2")
        .filter($"s1" === $"s2")
        .groupBy($"id1", $"id2").agg(count(lit(1)).as("inter"))
        .join(sizes.select($"doc_id".as("id1"), $"n".as("n1")), "id1")
        .join(sizes.select($"doc_id".as("id2"), $"n".as("n2")), "id2")
        .filter($"inter" * 2 >= ($"n1" + $"n2" - $"inter"))
      cand.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(verified.agg(count(lit(1)).as("n_verified")))
        .crossJoin(planted.join(cand, Seq("id1", "id2"), "left_semi")
          .agg(count(lit(1)).as("n_planted_found")))
        .crossJoin(nPlanted)
        .select(lit(s"b${b}r$r").as("config"), lit(b).as("b"), lit(r).as("r"),
          $"n_candidates", $"n_verified",
          ($"n_verified".cast("double") / $"n_candidates").as("precision"),
          $"n_planted", $"n_planted_found",
          ($"n_planted_found".cast("double") / $"n_planted").as("recall"))
    }.reduce(_ unionByName _)
    // 2 rows; the memo materializes the report and releases every
    // pipeline cache (ids, sig, the per-config candidate sets)
    (report, Seq(ids, sig) ++ cands)
  }

  // --- d16: normalization-aware exact dedup --------------------------------

  /** Text canonicalization before hashing: lowercase → strip every char
    * outside [a-z0-9 ] → collapse whitespace runs → trim. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Normalization-aware exact dedup: canonicalize THEN hash — catching
    * the case/punctuation/whitespace variants that raw-md5 dedup (d01)
    * misses (the first lesson of web-corpus dedup: near-identical docs
    * differ in markup noise, not words). Planted noisy copies (upcased
    * prefix + punctuation + doubled spaces) must collapse onto their
    * source under the normalized hash while staying distinct under the
    * raw hash. Same one-shuffle hash-groupBy shape as d01; the
    * normalization is a map-side expression chain. */
  def d16NormalizedDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.documents(spark, dir).select($"doc_id", $"text")
    val noised = base.filter($"doc_id" % 10 === 3)
      .select(($"doc_id" + 3000000L).as("doc_id"),
        concat(upper(substring($"text", 1, 10)), expr("substring(text, 11)"),
          lit("  !!")).as("text"))
    val corpus = base.unionByName(noised)
      .select($"doc_id", md5($"text".cast("binary")).as("raw_h"),
        md5(normalizeText($"text").cast("binary")).as("norm_h"))
    // r19: per-group stats as WINDOW functions over the one norm_h
    // shuffle instead of a groupBy + join-back — the join form computed
    // the corpus subtree (normalize regex chain + two md5s over full
    // text) twice, once per join side. Same rows, one exchange.
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"norm_h")
    corpus
      .withColumn("n_same_norm", count(lit(1)).over(w))
      .withColumn("n_raw_variants",
        size(collect_set($"raw_h").over(w)).cast("long"))
      .withColumn("keeper", min($"doc_id").over(w))
      .select($"doc_id", $"n_same_norm", $"n_raw_variants",
        ($"doc_id" === $"keeper").as("is_keeper"))
  }

  // --- d31: deletion-neighborhood fuzzy join ------------------------------

  /** d31: edit-distance-blocked fuzzy join over the corpus vocabulary —
    * the typo/variant matcher (OCR noise, tokenizer drift, near-key
    * record linkage) that exact hashing (d01/d16) and shingle jaccard
    * (d02+) are both blind to at the single-token granularity. The naive
    * form is all-pairs |V|² levenshtein; the scale form is FastSS-style
    * deletion-neighborhood blocking (Bocek et al. 2007): two strings are
    * within edit distance 1 IFF they share a member of their 1-deletion
    * neighborhoods (the string itself plus each single-character
    * deletion — a substitution at position i means both sides delete i
    * to the same string; an insert/delete means one side IS the other's
    * deletion), so candidate generation is a map-side variant explode
    * (≤ len+1 variants per token, bounded by token length) and ONE
    * hash-partitioned equi-join on the variant — exact-dedup's shuffle
    * shape at variant granularity, never all-pairs. The neighborhood
    * test over-generates transposition-shaped dist-2 pairs (ab/ba share
    * both "a" and "b"), so candidates pass a final levenshtein ≤ 1
    * verify — candidate-sized, never corpus-sized. Variants shared by
    * > 100 tokens are dropped as degenerate blocks first (the d30
    * fan-out cap: any block's join cost is capped at cap²).
    *
    * The corpus vocabulary is generator word-soup with no organic typos,
    * so the query plants them: every selected-by-portable-hash token of
    * length ≥ 5 gains a second-character-deleted variant, which must
    * pair with (exactly) its source. Everything — tokenize, plant,
    * variants, cap, verify — is string arithmetic both engines evaluate
    * identically, so the readout is oracle-exact. */
  def d31FuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.documents(spark, dir)
      .select(explode(TextAnalysis.tokens($"text")).as("tok"))
      .filter(length($"tok") >= 4).distinct()
    // one planted variant per single-edit CLASS (delete 2nd char,
    // substitute 3rd char, duplicate 1st char) so the join demonstrably
    // catches all three lev-1 modes — variants of the SAME source sit at
    // distance 2 from each other and must NOT pair
    val seeds = base.filter(length($"tok") >= 5 && pmod(
      conv(substring(md5($"tok".cast("binary")), 1, 8), 16, 10).cast("long"),
      lit(3L)) === 0L)
    val planted = seeds
      .select(explode(array(
        concat(substring($"tok", 1, 1), expr("substr(tok, 3)")),
        concat(substring($"tok", 1, 2), lit("z"), expr("substr(tok, 4)")),
        concat(substring($"tok", 1, 1), $"tok"))).as("tok"))
    val vocab = base.unionByName(planted).distinct()
    val vars = vocab.select($"tok", explode(array_distinct(concat(
        array($"tok"),
        expr("transform(sequence(0, length(tok) - 1), i -> concat(substr(tok, 1, i), substr(tok, i + 2)))")
      ))).as("variant"))
    // r19: ONE variant-keyed agg collects each block's (distinct) token
    // set, the >100 degenerate-block cap becomes a size filter on that
    // set, and the ordered token pairs are generated MAP-SIDE from the
    // array (p08's device) — replacing the count-agg + anti-join + self
    // join chain that computed the variant explode three times and
    // shuffled it three times. Pair rows are identical: the self-join
    // emitted one row per (variant, t1 < t2), exactly this generator.
    val pairExpr = expr(
      """flatten(transform(toks, x ->
           transform(filter(toks, y -> y > x), y ->
             named_struct('t1', x, 't2', y))))""")
    vars.groupBy($"variant").agg(collect_set($"tok").as("toks"))
      .filter(size($"toks") <= 100)
      .select(explode(pairExpr).as("p"))
      .select($"p.t1".as("t1"), $"p.t2".as("t2"))
      .groupBy($"t1", $"t2")
      .agg(count(lit(1)).as("n_shared_variants"))
      .filter(levenshtein($"t1", $"t2") <= 1)
  }

  // --- d15: minhash estimator quality -------------------------------------

  /** MinHash estimator evaluation: for the planted exact/near/control
    * pairs, the K=8-signature agreement estimate ĵ = |{i : minᵢ(a) =
    * minᵢ(b)}| / K next to the exact shingle jaccard — the measurement
    * that justifies (or rejects) a signature width before a corpus-scale
    * run, the MinHash twin of s07's ANN recall readout. Everything is
    * integer-derived (agreement counts, set sizes), so both engines agree
    * bit-for-bit on the derived percentages. Scale shape: signatures are
    * one groupBy over (doc, shingle-id); the eval joins only the planted
    * pair list — never all pairs. */
  def d15MinhashEstimate(spark: SparkSession, dir: String): DataFrame =
      memoMaterialized(spark, dir, "d15:estimate") {
    import spark.implicits._
    val corpus = corpusWithCopies(Tables.documents(spark, dir))
    val sh = shingles(corpus)
    val ids = sh.join(shingleDict(sh), "shingle").select($"doc_id", $"sid").cache()
    val sig = signatures(ids)
    val base = Tables.documents(spark, dir).select($"doc_id")
    val pairs =
      base.filter($"doc_id" % 10 === 0)
        .select($"doc_id".as("id1"), ($"doc_id" + 1000000L).as("id2"), lit("exact").as("kind"))
      .unionByName(base.filter($"doc_id" % 10 === 5)
        .select($"doc_id".as("id1"), ($"doc_id" + 2000000L).as("id2"), lit("near").as("kind")))
      .unionByName(base.filter($"doc_id" % 20 === 0)
        .select($"doc_id".as("id1"), ($"doc_id" + 5).as("id2"), lit("control").as("kind")))
    val s1 = sig.select(col("doc_id").as("id1") +:
      (0 until K).map(i => col(s"min_$i").as(s"x_$i")): _*)
    val s2 = sig.select(col("doc_id").as("id2") +:
      (0 until K).map(i => col(s"min_$i").as(s"y_$i")): _*)
    val agree = (0 until K).map(i =>
      when(col(s"x_$i") === col(s"y_$i"), 1).otherwise(0): Column).reduce(_ + _)
    val sizes = ids.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(ids.select($"doc_id".as("id1"), $"sid".as("s1")), "id1")
      .join(ids.select($"doc_id".as("id2"), $"sid".as("s2")), "id2")
      .filter($"s1" === $"s2")
      .groupBy($"id1", $"id2").agg(count(lit(1)).as("inter"))
    (pairs
      .join(s1, "id1").join(s2, "id2")
      .withColumn("est_pct", agree * lit(100.0) / K)
      .join(inter, Seq("id1", "id2"), "left").na.fill(0L, Seq("inter"))
      .join(sizes.select($"doc_id".as("id1"), $"n".as("n1")), "id1")
      .join(sizes.select($"doc_id".as("id2"), $"n".as("n2")), "id2")
      .withColumn("jacc_pct", $"inter" * 100.0 / ($"n1" + $"n2" - $"inter"))
      .select($"kind", $"id1", $"id2", $"est_pct", $"jacc_pct",
        ($"est_pct" - $"jacc_pct").as("err_pct")),
      Seq(ids))
  }

  // --- d14: passage-level (sub-document) dedup ----------------------------

  /** Passage window width (words) for d14. */
  val PassageW = 16

  /** Passage-level dedup (the CCNet/RefinedWeb line-dedup shape, adapted
    * to word-window passages since the fixture has no newlines): split
    * each document into disjoint 16-word passages, drop every passage
    * whose exact text already occurred at a smaller (doc_id, chunk_idx),
    * and report per-document retention. Unlike d01's whole-doc hashing
    * this removes boilerplate *inside* otherwise-unique documents —
    * the dominant duplication mode in web corpora (headers, footers,
    * licence blocks). Scale shape: passage explode is map-side; the
    * keep-first flag is ONE hash-partitioned window on md5(passage) —
    * no all-pairs, no global sort; the per-doc rollup re-shuffles by
    * doc_id. Reference delegates dedup entirely to its engines; this is
    * north-star surface (BASELINE.json). */
  def d14PassageDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val W = PassageW
    val toks = TextAnalysis.tokens($"text")
    val chunks = corpusWithCopies(Tables.documents(spark, dir))
      .select($"doc_id", toks.as("toks"), size(toks).cast("long").as("n_tokens"))
      .withColumn("chunk_idx",
        explode(sequence(lit(0L), expr(s"(n_tokens + ${W - 1}) div $W") - 1)))
      .select($"doc_id", $"n_tokens", $"chunk_idx",
        md5(concat_ws(" ", slice($"toks", ($"chunk_idx" * W + 1).cast("int"), lit(W))))
          .as("h"),
        least(lit(W.toLong), $"n_tokens" - $"chunk_idx" * W).as("clen"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"h").orderBy($"doc_id", $"chunk_idx")
    chunks.withColumn("rn", row_number().over(w))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when($"rn" > 1, 1L).otherwise(0L)).as("n_dup"),
        (sum(when($"rn" === 1, $"clen").otherwise(0L)).cast("double") /
          min($"n_tokens")).as("retained_frac"))
  }

  // --- d27: repeated-substring span detection -----------------------------

  /** Minimum repeated-substring length (tokens) for d27. */
  val RepSpanK = 8

  /** Repeated-substring span detection (the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better" ExactSubstr
    * semantics, re-expressed relationally): find, per document, the maximal
    * spans whose every K-token window occurs at least twice ANYWHERE in the
    * corpus — the substring-granular duplication that whole-doc (d01) and
    * fixed-chunk (d14) dedup both miss when the boilerplate straddles chunk
    * boundaries. Mechanics: every K-token window (stride 1) is hashed;
    * windows whose hash repeats corpus-wide are flagged; per doc the flagged
    * window starts are merged gaps-and-islands style (new island when the
    * gap exceeds K) into maximal spans. Output: per doc with ≥1 span, the
    * span count, repeated-token coverage, and coverage fraction.
    *
    * Scale shape: the window explode is one row per TOKEN (linear, the same
    * order a suffix-array build touches); the repeat flag is one
    * hash-partitioned groupBy + equi-join on the window hash — exact-dedup's
    * shuffle at token granularity, never all-pairs; the island merge is one
    * per-doc window. At 100 TB the stride-1 hash volume is the honest cost
    * of exact-substring semantics — a winnowed (Schleimer 2003) anchor
    * subset is the approximate fallback if even that shuffle is too big. */
  def d27RepeatedSpans(spark: SparkSession, dir: String): DataFrame =
      memoMaterialized(spark, dir, "d27:spans") {
    import spark.implicits._
    val K = RepSpanK
    val toks = TextAnalysis.tokens($"text")
    val base = corpusWithCopies(Tables.documents(spark, dir))
      .select($"doc_id", toks.as("toks"))
      .select($"doc_id", $"toks", size($"toks").cast("long").as("n_tokens"))
      .filter($"n_tokens" >= K)
    val wins = base
      .withColumn("p", explode(sequence(lit(0L), $"n_tokens" - K)))
      .select($"doc_id", $"n_tokens", $"p",
        md5(concat_ws(" ", slice($"toks", ($"p" + 1).cast("int"), lit(K)))).as("h"))
    val repeated = wins.groupBy($"h")
      .agg(count(lit(1)).as("cnt")).filter($"cnt" > 1).select($"h")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"p")
    (wins.join(repeated, "h")
      .withColumn("gap",
        when($"p" - lag($"p", 1).over(w) > K, 1L).otherwise(0L))
      .withColumn("island", sum($"gap").over(w))
      .groupBy($"doc_id", $"n_tokens", $"island")
      .agg((max($"p") + K - min($"p")).as("span_len"))
      .groupBy($"doc_id", $"n_tokens")
      .agg(count(lit(1)).as("n_spans"), sum($"span_len").as("rep_tokens"))
      .select($"doc_id", $"n_spans", $"rep_tokens", $"n_tokens",
        ($"rep_tokens".cast("double") / $"n_tokens").as("rep_frac")),
      Nil)
  }

  // --- d29: winnowed fingerprint anchors ----------------------------------

  /** Winnowing k-gram size / window size. Guarantee threshold t = W+K-1 = 8
    * tokens — deliberately equal to [[RepSpanK]], so d29 is the documented
    * approximate fallback for exactly the spans d27 detects. */
  val WinnowK = 5
  val WinnowW = 4

  /** Winnowed document fingerprints (Schleimer, Wilkerson & Aiken 2003,
    * "Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
    * scheme): hash every K-token gram (stride 1), slide a W-gram window,
    * keep each window's minimum hash (rightmost on ties). Guarantees: any
    * token run of length ≥ W+K-1 shared by two documents shares at least
    * one selected anchor, at an expected density of 2/(W+1) — the
    * sub-sampling d27's Scaladoc names as the fallback when the stride-1
    * shuffle volume is too big (~40% of it at W=4, with a detection
    * guarantee instead of hope).
    *
    * Relational mechanics: the per-window argmin needs no self-join — the
    * (hash, position) pair packs into ONE long (`h20·2^43 + (2^43-1-p)`, a
    * 20-bit md5-prefix hash and a reversed position so the natural MIN is
    * rightmost-on-ties; the 43-bit position field keeps the packing
    * collision-free for documents up to 2^43 ≈ 8.8e12 grams — any
    * conceivable single document. The packing is EXACTLY at capacity:
    * the maximum key is (2^20−1)·2^43 + (2^43−1) = 2^63−1 = Long.MaxValue
    * with ZERO slack — widening either field by even one bit overflows
    * into negative keys and corrupts the argmin), so selection is a
    * single keyed window MIN over
    * ROWS [CURRENT, W-1 FOLLOWING] plus DISTINCT on the decoded position —
    * one Generate (linear in tokens), one per-doc window, one
    * hash-partitioned share join. No global sort, no all-pairs anywhere.
    * Output per doc: gram count, anchor count, anchor density, and how
    * many anchors also appear as anchors in another document (the
    * near-dup candidate signal). Oracle replays the packing verbatim
    * (`CAST('0x'||substr(md5,1,5) AS BIGINT)` ≡ `conv(…,16,10)`). */
  /** The winnowed anchor table over the planted corpus — one row per
    * selected (doc_id, apos) anchor with its full gram hash `h` and the
    * doc's gram count. The shared substrate of d29 (per-doc fingerprint
    * report) and d30 (cross-doc containment pairing); memoized per
    * (session, dir) so both consumers read ONE cached table. */
  private[graft] def winnowAnchors(spark: SparkSession, dir: String): DataFrame =
    memoMaterialized(spark, dir, "winnowAnchors") {
      import spark.implicits._
      val K = WinnowK; val W = WinnowW
      val base = corpusWithCopies(Tables.documents(spark, dir))
        .select($"doc_id", TextAnalysis.tokens($"text").as("toks"))
        .select($"doc_id", $"toks", size($"toks").cast("long").as("n_tokens"))
        .filter($"n_tokens" >= K + W - 1)
      // referenced twice (window-min selection + anchor-hash join-back):
      // cached, or the shingle explode + md5 pass runs twice. At 100 TB
      // the gram table is corpus-token-sized — there the anchor pass
      // WRITES grams once (or lets the scan recompute, which beats
      // spilling a token-scale cache); locally the cache is the right
      // trade and keeps the plan identical across both reads.
      val grams = base
        .withColumn("p", explode(sequence(lit(0L), $"n_tokens" - K)))
        .select($"doc_id", ($"n_tokens" - K + 1).as("n_grams"), $"p",
          md5(concat_ws(" ", slice($"toks", ($"p" + 1).cast("int"), lit(K)))).as("h"))
        .withColumn("key",
          conv(substring($"h", 1, 5), 16, 10).cast("long") * 8796093022208L +
            (lit(8796093022207L) - $"p"))
        .cache()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"p").rowsBetween(0, W - 1)
      val anchors = grams
        .withColumn("wmin", min($"key").over(w))
        .filter($"p" <= $"n_grams" - W) // full windows only
        .select($"doc_id", $"n_grams",
          (lit(8796093022207L) - $"wmin" % 8796093022208L).as("apos"))
        .distinct()
      // re-attach the anchor gram's full hash (the content identity for the
      // cross-doc share check; the 20-bit h20 exists only for the packed min)
      (anchors.join(
        grams.select($"doc_id", $"p".as("apos"), $"h"), Seq("doc_id", "apos")),
        Seq(grams))
    }

  def d29WinnowFingerprint(spark: SparkSession, dir: String): DataFrame =
    d29Report(winnowAnchors(spark, dir))

  /** The d29 downstream, a pure function of the anchor table — factored
    * (like Multimodal.m10OffsetMatch) so the documented cache→parquet
    * degradation path is executable: Round11Spec materializes
    * [[winnowAnchors]] to parquet and proves this report row-identical
    * off the re-read. */
  private[graft] def d29Report(anc: DataFrame): DataFrame = {
    import anc.sparkSession.implicits._
    val docsPerH = anc.groupBy($"h").agg(countDistinct($"doc_id").as("nd"))
    anc.join(docsPerH, "h")
      .groupBy($"doc_id")
      .agg(min($"n_grams").as("n_grams"), count(lit(1)).as("n_anchors"),
        sum(when($"nd" > 1, 1L).otherwise(0L)).as("n_shared"))
      .select($"doc_id", $"n_grams", $"n_anchors",
        ($"n_anchors".cast("double") / $"n_grams").as("density"), $"n_shared")
  }

  /** Anchors appearing in more than this many documents are treated as
    * boilerplate (headers, license blurbs, generator templates) and
    * excluded from containment pairing — the d27 "too-common span"
    * device applied at the anchor level. Caps the per-hash join fan-out:
    * no anchor hash can contribute more than cap² candidate pairs. */
  val AnchorDocCap = 50L

  /** d30: containment / partial-overlap detection on the winnowed
    * anchors — the MOSS-style application d29's fingerprints exist for,
    * and the dedup mode jaccard is structurally blind to: a document
    * quoted INSIDE a larger one shares a small fraction of the union
    * (low jaccard — d02/d18 never pair it) but a large fraction of the
    * SMALLER doc's fingerprint. Pairs are ranked by exactly that:
    * shared distinct anchor hashes over the smaller doc's distinct
    * anchor count, kept at containment ≥ 0.5.
    *
    * Scale shape: the pairing joins the ANCHOR table (~2/(W+1) of the
    * gram table) on anchor hash — hash-partitioned, no all-pairs, and
    * the [[AnchorDocCap]] boilerplate cap bounds any hash's fan-out at
    * cap² pairs, the same hot-key discipline as the LSH band joins.
    * Every step is exact integer arithmetic + one IEEE division, so the
    * oracle replays it verbatim over the d29 CTE chain. */
  def d30ContainmentDedup(spark: SparkSession, dir: String): DataFrame =
      memoMaterialized(spark, dir, "d30:contain") {
    import spark.implicits._
    val anc = winnowAnchors(spark, dir)
    val hFreq = anc.groupBy($"h").agg(countDistinct($"doc_id").as("nd"))
    // one row per (doc, anchor hash): a hash winnowed at several
    // positions of one doc counts once toward overlap and denominator
    val docH = anc.join(hFreq.filter($"nd" <= AnchorDocCap), "h")
      .select($"doc_id", $"h").distinct().cache()
    val perDoc = docH.groupBy($"doc_id").agg(count(lit(1)).as("na"))
    val shared = docH.as("x").join(docH.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
      .agg(count(lit(1)).as("n_shared"))
    (shared
      .join(perDoc.select($"doc_id".as("id1"), $"na".as("n1")), "id1")
      .join(perDoc.select($"doc_id".as("id2"), $"na".as("n2")), "id2")
      .filter($"n_shared" * 2 >= least($"n1", $"n2"))
      .select($"id1", $"id2", $"n_shared", $"n1", $"n2",
        ($"n_shared" * 100.0 / least($"n1", $"n2")).as("containment_pct")),
      Seq(docH))
  }

  // --- d12: incremental (batch-vs-index) dedup ----------------------------

  /** The incoming-batch fixture for incremental dedup: exact copies,
    * near copies (first token dropped), and genuinely-new documents
    * (token-sorted rewrite — word-3-gram shingles are order-sensitive, so
    * the sorted text shares almost none with its source). */
  def incomingBatch(docs: DataFrame): DataFrame = {
    val exact = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val near = docs.filter(col("doc_id") % 10 === 5)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))
    val fresh = docs.filter(col("doc_id") % 10 === 7)
      .select((col("doc_id") + 3000000L).as("doc_id"),
        array_join(array_sort(TextAnalysis.tokens(col("text"))), " ").as("text"))
    exact.unionByName(near).unionByName(fresh)
  }

  val incomingCorpusSql: String =
    """corpus AS (
         SELECT doc_id, text FROM documents
         UNION ALL
         SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
         UNION ALL
         SELECT doc_id + 2000000 AS doc_id,
                substring(text, instr(text, ' ') + 1) AS text
         FROM documents WHERE doc_id % 10 = 5
         UNION ALL
         SELECT doc_id + 3000000 AS doc_id,
                array_to_string(list_sort(string_split_regex(text, '\s+')), ' ') AS text
         FROM documents WHERE doc_id % 10 = 7)"""

  /** Incremental dedup — the operational "admit this batch against the
    * existing corpus index" API every continuously-ingesting training
    * pipeline runs: each incoming doc is checked for an exact (content
    * hash) and a near (verified LSH jaccard ≥ 0.5) match AGAINST THE
    * INDEX ONLY, and admitted iff neither fires. Scale shape: the hash
    * probe is one equi-join on md5; the near probe is the same banded-LSH
    * join as d02/d06 — never all-pairs — and at 100 TB the index side's
    * signatures are a precomputed table, so an incremental run only
    * shingles the new batch. */
  def d12IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val index = docs.select($"doc_id", $"text")
    val batch = incomingBatch(docs)
    val idxHash = index.select(md5($"text".cast("binary")).as("h"), $"doc_id".as("idx_id"))
    val exactHits = batch.select($"doc_id", md5($"text".cast("binary")).as("h"))
      .join(idxHash, "h")
      .groupBy($"doc_id").agg(min($"idx_id").as("exact_match"))
    // near pairs over index ∪ batch; id1 < id2 and batch ids are +1e6, so
    // cross-boundary pairs always have the index doc on the id1 side
    val nearHits = minHashPairsDict(index.unionByName(batch))
      .filter($"id1" < 1000000L && $"id2" >= 1000000L)
      .groupBy($"id2".as("doc_id")).agg(min($"id1").as("near_match"))
    batch.select($"doc_id")
      .join(exactHits, Seq("doc_id"), "left")
      .join(nearHits, Seq("doc_id"), "left")
      .select($"doc_id",
        $"exact_match".isNotNull.as("is_exact_dup"),
        $"near_match".isNotNull.as("is_near_dup"),
        coalesce($"exact_match", $"near_match").as("matched_id"),
        ($"exact_match".isNull && $"near_match".isNull).as("admit"))
  }

  /** d22: [[d12IncrementalDedup]]'s admit decision with the near probe on
    * the zero-explode xxhash64 pipeline ([[minHashPairsMapSide]] over
    * index ∪ batch) — the incremental-admission form a 100 TB ingest
    * runs: no dictionary over the combined corpus, no global sort; the
    * exact probe stays the same one md5 equi-join. Oracle-exact since r9
    * via the exact all-pairs true-jaccard device restricted to
    * index-side partners ([[exactNearCtesFor]]); Round7Spec additionally
    * pins the planted admit/reject structure and parity with d12. */
  def d22IncrementalScale(spark: SparkSession, dir: String): DataFrame =
      memoMaterialized(spark, dir, "d22:admit") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    incrementalDecisionStaged(docs.select($"doc_id", $"text"), incomingBatch(docs))
  }

  /** The admit decision shared by d22 (one-shot) and d32 (streaming):
    * exact (md5 equi-join) and near (map-side LSH, TRUE-jaccard
    * verified) probes AGAINST THE INDEX ONLY. Because the minhash
    * signature is a pure per-document function (no corpus dictionary),
    * the near probe's banding is independent of WHICH other docs share
    * the batch — so the decision for a doc is identical whether it
    * arrives alone, in d22's one big batch, or in any micro-batch tiling
    * (the property d32's oracle relies on — d32 probes a PREPARED index
    * with per-batch band joins, provably the same pair set). */
  private[graft] def incrementalDecision(index: DataFrame, batch: DataFrame,
                                         cachePairs: Boolean = true): DataFrame =
    incrementalDecisionStaged(index, batch, cachePairs)._1

  private def incrementalDecisionStaged(index: DataFrame, batch: DataFrame,
                                        cachePairs: Boolean = true): (DataFrame, Seq[DataFrame]) = {
    import index.sparkSession.implicits._
    val idxHash = index.select(md5($"text".cast("binary")).as("h"), $"doc_id".as("idx_id"))
    val exactHits = batch.select($"doc_id", md5($"text".cast("binary")).as("h"))
      .join(idxHash, "h")
      .groupBy($"doc_id").agg(min($"idx_id").as("exact_match"))
    val (pairs, pairCaches) =
      minHashPairsMapSideStaged(index.unionByName(batch), doCache = cachePairs)
    val nearHits = pairs
      .filter($"id1" < 1000000L && $"id2" >= 1000000L)
      .groupBy($"id2".as("doc_id")).agg(min($"id1").as("near_match"))
    (batch.select($"doc_id")
      .join(exactHits, Seq("doc_id"), "left")
      .join(nearHits, Seq("doc_id"), "left")
      .select($"doc_id",
        $"exact_match".isNotNull.as("is_exact_dup"),
        $"near_match".isNotNull.as("is_near_dup"),
        coalesce($"exact_match", $"near_match").as("matched_id"),
        ($"exact_match".isNull && $"near_match".isNull).as("admit")),
      pairCaches)
  }

  /** d32: [[d22IncrementalScale]]'s admit decision running CONTINUOUSLY
    * over the lakehouse — the operational shape of a live training-data
    * ingest: incoming documents land in a commit table across three
    * commits, the table's CHANGELOG stream (the o20 device — offset =
    * commit id, one micro-batch per commit) delivers each arrival wave
    * exactly once, every micro-batch is checked against the FIXED corpus
    * index, and decisions append to a committed results table through
    * the transactional sink. The per-doc minhash signature makes the
    * decision batch-composition independent (see
    * [[incrementalDecision]]), so the union of per-batch decisions is
    * BY CONSTRUCTION equal to d22's one-shot run no matter how commits
    * tile the incoming set — which is why d22's oracle is this query's
    * oracle verbatim, and LakeSpec pins row-identity with d22. At
    * 100 TB the index side's signatures are a precomputed table (d22's
    * scale note) and each trigger's work is batch-sized; the streaming
    * loop adds no new shuffle shape. */
  /** The 2-row-per-signature LSH band projection shared by the map-side
    * pair build and the prepared-index probe. */
  private def bandsOf(sig: DataFrame): DataFrame = {
    import sig.sparkSession.implicits._
    explodeBands(sig, Seq($"doc_id"), (0 until K / 2).map(b =>
      concat_ws(":", element_at($"sig", 2 * b + 1),
                     element_at($"sig", 2 * b + 2))))
  }

  /** One micro-batch's admit decisions against the prepared index —
    * shared by d32 (live ingest) and d33 (recovery after rewrite): the
    * batch shingles only ITSELF and probes the stored band/shingle/hash
    * tables. candidates = stored index bands ⋈ the batch's bands — the
    * same cross-boundary pair set `minHashPairsMapSide(index ∪ batch)`
    * yields (signatures are per-doc, so banding cannot depend on batch
    * composition), verified on TRUE jaccard. */
  private def probeIndex(spark: SparkSession, b: DataFrame, sharrIdx: DataFrame,
                         bandsIdx: DataFrame, idxHash: DataFrame): DataFrame = {
    import spark.implicits._
    // the micro-batch runs in a CLONED session whose function registry
    // predates minhash_sig's lazy registration
    graft.functions.MinHash.register(b.sparkSession)
    graft.functions.MinHash.register(spark)
    val sharrB = shingleArrays(b).filter(size($"shingles") > 0)
    val sigB = sharrB.select($"doc_id",
      graft.functions.MinHash.minhashSig($"shingles", K, P).as("sig"))
    val cand = bandsIdx.as("x").join(bandsOf(sigB).as("y"),
        $"x.band" === $"y.band" && $"x.bkey" === $"y.bkey")
      .select($"x.doc_id".as("id1"), $"y.doc_id".as("id2")).distinct()
    val nearHits = cand
      .join(sharrIdx.select($"doc_id".as("id1"), $"shingles".as("sh1")), "id1")
      .join(sharrB.select($"doc_id".as("id2"), $"shingles".as("sh2")), "id2")
      .select($"id1", $"id2",
        size(array_intersect($"sh1", $"sh2")).cast("long").as("inter"),
        size($"sh1").cast("long").as("n1"),
        size($"sh2").cast("long").as("n2"))
      .filter($"inter" * 2 >= ($"n1" + $"n2" - $"inter"))
      .groupBy($"id2".as("doc_id")).agg(min($"id1").as("near_match"))
    val exactHits = b.select($"doc_id", md5($"text".cast("binary")).as("h"))
      .join(idxHash, "h")
      .groupBy($"doc_id").agg(min($"idx_id").as("exact_match"))
    b.select($"doc_id")
      .join(exactHits, Seq("doc_id"), "left")
      .join(nearHits, Seq("doc_id"), "left")
      .select($"doc_id",
        $"exact_match".isNotNull.as("is_exact_dup"),
        $"near_match".isNotNull.as("is_near_dup"),
        coalesce($"exact_match", $"near_match").as("matched_id"),
        ($"exact_match".isNull && $"near_match".isNull).as("admit"))
  }

  def d32StreamDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = s"/tmp/graft_d32/${new java.io.File(dir).getName}"
    Tables.deleteRecursively(base)
    val inPath = s"$base/incoming"; val outPath = s"$base/decisions"
    val docs = Tables.documents(spark, dir)
    val index = docs.select($"doc_id", $"text")
    // The index side is prepared ONCE, before the stream starts — the
    // 100 TB form d22's scale note names: shingle arrays, signatures'
    // band table, and the content-hash table are a STORED index a live
    // ingest MAINTAINS, not something recomputed per arrival wave. The
    // three tables are cached for the QUERY's lifetime and unpersisted
    // once the decisions have landed: a session-lifetime memo here
    // stacked three corpus-sized cached relations on top of the 27
    // shared memos and evicted the dedup family's working set between
    // bench passes (the r11 2-7.5x outlier cluster) — the maintained
    // index a live ingest keeps is storage, not executor cache.
    val sharrIdx = shingleArrays(index).filter(size($"shingles") > 0).cache()
    val bandsIdx = bandsOf(sharrIdx.select($"doc_id",
      graft.functions.MinHash.minhashSig($"shingles", K, P).as("sig"))).cache()
    val idxHash = index.select(md5($"text".cast("binary")).as("h"),
      $"doc_id".as("idx_id")).cache()
    try {
      // two arrival waves: the multi-batch proof shape (>= 2 real
      // triggers — the c17/o10 trigger-count precedent) at the least
      // per-trigger harness cost; the decision is tiling-invariant, so
      // any split proves the same property
      val incoming = incomingBatch(docs)
      incoming.filter($"doc_id" % 2 === 0)
        .write.format("graft-commit").option("path", inPath).mode("overwrite").save()
      incoming.filter($"doc_id" % 2 === 1)
        .write.format("graft-commit").option("path", inPath).mode("append").save()
      val q = spark.readStream.format("graft-commit")
        .option("path", inPath).option("maxCommitsPerTrigger", "1").load()
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          probeIndex(spark, b, sharrIdx, bandsIdx, idxHash)
            .write.format("graft-commit").option("path", outPath)
            .mode("append").save()
          ()
        }
        .option("checkpointLocation", s"$base/ck")
        .start()
      q.processAllAvailable()
      q.stop()
      // the multi-batch proof shape, checked BEFORE the scratch is
      // swept (LakeSpec relies on this require): one decision commit
      // per incoming changelog micro-batch
      require(graft.sources.CommitSink
          .listVersions(java.nio.file.Paths.get(outPath)).size == 2,
        "d32: expected one decision commit per incoming micro-batch")
      // HARNESS SHIM, fixture-sized by construction (one decision row
      // per incoming doc — ~30% of the documents table): materialize so
      // the scratch tables + checkpoint can be deleted before returning
      // (the c17/o26 standard). Production keeps the decisions table —
      // it IS the output a live ingest maintains.
      Tables.materialize(graft.sources.CommitSink.readCommitted(spark, outPath))
    } finally {
      sharrIdx.unpersist(); bandsIdx.unpersist(); idxHash.unpersist()
      Tables.deleteRecursively(base)
    }
  }

  /** d33: d32's ingest loop under the OPERATIONAL failure the o19/o20
    * unit tests pin separately — "consumer lags, the table compacts
    * underneath it, the consumer recovers" — composed end to end:
    *
    *  1. wave 1 commits; the consumer processes it and STOPS (lags);
    *  2. wave 2 commits, then the table COMPACTS (a rewrite commit);
    *  3. the lagging consumer resumes its checkpoint and must FAIL
    *     LOUDLY — the changelog contract refuses a range that removed
    *     files (silent replay/skip is the data-loss case);
    *  4. recovery: a fresh checkpoint bootstraps from the current
    *     SNAPSHOT (one batch, the whole compacted table), and the
    *     decision write is made idempotent by anti-joining the doc_ids
    *     already decided — the re-read of wave 1 lands nothing twice.
    *
    * The final decision set must equal d22's one-shot run exactly
    * (d22's oracle verbatim, like d32) — proving recovery-after-rewrite
    * loses nothing and duplicates nothing. At 100 TB the anti-join is
    * the idempotent-sink MERGE every exactly-once recovery runs; its
    * key side is the decisions table's doc_id column, shuffle-sized. */
  def d33StreamDedupRecovery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = s"/tmp/graft_d33/${new java.io.File(dir).getName}"
    Tables.deleteRecursively(base)
    val inPath = s"$base/incoming"; val outPath = s"$base/decisions"
    val docs = Tables.documents(spark, dir)
    val index = docs.select($"doc_id", $"text")
    // prepared index, cached for the query, released after (see d32)
    val sharrIdx = shingleArrays(index).filter(size($"shingles") > 0).cache()
    val bandsIdx = bandsOf(sharrIdx.select($"doc_id",
      graft.functions.MinHash.minhashSig($"shingles", K, P).as("sig"))).cache()
    val idxHash = index.select(md5($"text".cast("binary")).as("h"),
      $"doc_id".as("idx_id")).cache()
    try {
      val incoming = incomingBatch(docs)
      def consume(ck: String, idempotent: Boolean): Unit = {
        val q = spark.readStream.format("graft-commit")
          .option("path", inPath).load()
          .writeStream
          .foreachBatch { (b: DataFrame, _: Long) =>
            // recovery re-reads the whole snapshot: drop docs already
            // decided (the idempotent-sink anti-join), decide the rest
            val fresh =
              if (!idempotent) b
              else b.join(graft.sources.CommitSink
                  .readCommitted(spark, outPath).select($"doc_id"),
                Seq("doc_id"), "left_anti")
            probeIndex(spark, fresh, sharrIdx, bandsIdx, idxHash)
              .write.format("graft-commit").option("path", outPath)
              .mode("append").save()
            ()
          }
          .option("checkpointLocation", ck)
          .start()
        try q.processAllAvailable()
        finally q.stop()
        // surface an async batch failure as this call's failure
        q.exception.foreach(e => throw e)
      }
      // 1. wave 1 lands; the consumer processes it, checkpoints, stops
      incoming.filter($"doc_id" % 2 === 0)
        .write.format("graft-commit").option("path", inPath).mode("overwrite").save()
      consume(s"$base/ck", idempotent = false)
      // 2. while the consumer is DOWN: wave 2 lands, then compaction
      //    rewrites the table under the lagging checkpoint
      incoming.filter($"doc_id" % 2 === 1)
        .write.format("graft-commit").option("path", inPath).mode("append").save()
      graft.sources.CommitSink.compact(spark, inPath, 1)
      // 3. resuming the stale checkpoint must fail LOUDLY — the
      //    changelog refuses ranges that removed files
      val refused =
        try { consume(s"$base/ck", idempotent = false); None }
        catch { case e: Throwable =>
          def msgs(t: Throwable): Seq[String] =
            if (t == null) Seq.empty
            else Option(t.getMessage).toSeq ++ msgs(t.getCause)
          Some(msgs(e))
        }
      require(refused.exists(_.exists(_.contains("append-only"))),
        s"resuming a checkpoint across a compaction must be refused, got: $refused")
      // 4. recovery: fresh checkpoint -> snapshot bootstrap (one batch,
      //    the whole compacted table), idempotent decision write
      consume(s"$base/ck2", idempotent = true)
      // exactly 2 decision commits: wave 1 before the lag, the recovery
      // batch after — the REFUSED resume must have written NOTHING.
      // Checked before the scratch sweep (Round12Spec relies on this).
      require(graft.sources.CommitSink
          .listVersions(java.nio.file.Paths.get(outPath)).size == 2,
        "d33: the refused resume must not land a commit")
      // HARNESS SHIM, fixture-sized (see d32): materialize the decision
      // set so the scratch tables + both checkpoints can be deleted
      Tables.materialize(graft.sources.CommitSink.readCommitted(spark, outPath))
    } finally {
      sharrIdx.unpersist(); bandsIdx.unpersist(); idxHash.unpersist()
      Tables.deleteRecursively(base)
    }
  }

  /** Round13Spec-only twin of [[d33StreamDedupRecovery]]: the SAME
    * checkpoint survives the mid-stream compaction because the stream
    * opts into the changelog's self-service recovery
    * (`option("snapshotOnRewrite", true)`) — when the append-only check
    * fires, the source re-bootstraps by emitting the current snapshot
    * as one batch instead of refusing, and the consumer's idempotent
    * anti-join absorbs the re-delivery. d33 (the registry entry) keeps
    * the LOUD-refusal default: silent re-delivery is only correct above
    * an idempotent sink, so it is opt-in, never the default. The
    * decision set must still equal d22's one-shot answer exactly. */
  private[graft] def d33SnapshotOnRewrite(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = s"/tmp/graft_r13_sor/${new java.io.File(dir).getName}"
    Tables.deleteRecursively(base)
    val inPath = s"$base/incoming"; val outPath = s"$base/decisions"
    val docs = Tables.documents(spark, dir)
    val index = docs.select($"doc_id", $"text")
    val sharrIdx = shingleArrays(index).filter(size($"shingles") > 0).cache()
    val bandsIdx = bandsOf(sharrIdx.select($"doc_id",
      graft.functions.MinHash.minhashSig($"shingles", K, P).as("sig"))).cache()
    val idxHash = index.select(md5($"text".cast("binary")).as("h"),
      $"doc_id".as("idx_id")).cache()
    try {
      val incoming = incomingBatch(docs)
      // ONE checkpoint for the whole exercise — the property under test
      def consume(): Unit = {
        val q = spark.readStream.format("graft-commit")
          .option("path", inPath)
          .option("snapshotOnRewrite", true)
          .load()
          .writeStream
          .foreachBatch { (b: DataFrame, _: Long) =>
            // idempotent from the first batch: a snapshot re-bootstrap
            // re-delivers everything, so every write anti-joins the
            // already-decided ids (the d33 recovery discipline, applied
            // unconditionally — which is what makes the opt-in safe)
            val decided = graft.sources.CommitSink
              .parseManifest(java.nio.file.Paths.get(outPath))
              .map(_ => graft.sources.CommitSink
                .readCommitted(spark, outPath).select($"doc_id"))
            val fresh = decided.fold(b)(d => b.join(d, Seq("doc_id"), "left_anti"))
            probeIndex(spark, fresh, sharrIdx, bandsIdx, idxHash)
              .write.format("graft-commit").option("path", outPath)
              .mode("append").save()
            ()
          }
          .option("checkpointLocation", s"$base/ck")
          .start()
        try q.processAllAvailable()
        finally q.stop()
        q.exception.foreach(e => throw e)
      }
      incoming.filter($"doc_id" % 2 === 0)
        .write.format("graft-commit").option("path", inPath).mode("overwrite").save()
      consume() // wave 1 decided; checkpoint records the offset
      incoming.filter($"doc_id" % 2 === 1)
        .write.format("graft-commit").option("path", inPath).mode("append").save()
      graft.sources.CommitSink.compact(spark, inPath, 1)
      // the SAME checkpoint resumes across the compaction: the source
      // re-bootstraps (full snapshot batch), the anti-join drops wave 1
      consume()
      // scratch cleanup is the CALLING spec's job: it asserts on the
      // checkpoint tree (one ck, no ck2) before deleting it
      graft.sources.CommitSink.readCommitted(spark, outPath)
    } finally {
      sharrIdx.unpersist(); bandsIdx.unpersist(); idxHash.unpersist()
    }
  }

  val queries: Map[String, Q] = Map(
    "d01_exact_dedup"   -> d01Exact _,
    "d14_passage_dedup" -> d14PassageDedup _,
    "d27_repeated_spans" -> d27RepeatedSpans _,
    "d29_winnow_fingerprint" -> d29WinnowFingerprint _,
    "d30_containment_dedup" -> d30ContainmentDedup _,
    "d15_minhash_estimate" -> d15MinhashEstimate _,
    "d16_normalized_dedup" -> d16NormalizedDedup _,
    "d17_lsh_tuning"       -> d17LshTuning _,
    "d31_fuzzy_join"       -> d31FuzzyJoin _,
    "d11_contamination" -> d11Contamination _,
    "d28_bloom_contamination" -> d28BloomContamination _,
    "d12_incremental_dedup" -> d12IncrementalDedup _,
    "d02_minhash_lsh"   -> d02MinHashLsh _,
    "d03_simhash"       -> d03SimHash _,
    "d04_ngram_jaccard" -> d04NgramJaccard _,
    "d05_embedding_neardup" -> d05EmbeddingNearDup _,
    // scale-path twin: xxhash64 ids, dictionary-free — the form to run
    // at 100 TB. Rows-only BY NECESSITY: its verify step counts matches
    // of xxhash64-mod-P ids, where collisions can inflate `inter`
    // beyond the true intersection — no exact SQL twin exists.
    // ExtSpec asserts parity with the dictionary form on planted dups.
    "d06_minhash_lsh_scale" -> minHashLshScale _,
    // oracle-exact since r9: d18 verifies TRUE jaccard on raw shingle
    // arrays, so the exact all-pairs form (exactNearCtesFor) is its
    // oracle — the check also pins the banding's full fixture recall
    "d18_minhash_mapside"   -> d18MinHashMapSide _,
    "d19_keep_best_dedup"   -> d19KeepBestDedup _,
    "d20_keep_best_scale"   -> d20KeepBestScale _,
    "d21_lsh_tuning_scale"  -> d21LshTuningScale _,
    "d22_incremental_scale" -> d22IncrementalScale _,
    "d32_stream_dedup"      -> d32StreamDedup _,
    "d33_stream_dedup_recovery" -> d33StreamDedupRecovery _,
    // d23 (8-bit-band simhash) demoted to spec-only in r9: the 256-key
    // pigeonhole banding is the small-corpus teaching form you'd never
    // run at scale (Θ(N²/256) candidate growth), and it was among the
    // slowest correctness queries for exactly that reason. Its wide twin
    // d26 is the graded form; Round7Spec still pins d23's recall.
    "d24_semdedup"          -> d24SemDedup _,
    "d25_simhash_mapside"   -> d25SimHashMapSide _,
    "d26_simhash_neardup_scale" -> d26SimHashNearDupScale _,
    "d07_dedup_corpus"      -> dedupCorpus _,
    "d08_simhash_scale"     -> simHashScale _,
    "d09_dedup_clusters"    -> d09DedupClusters _,
    "d10_dedup_clusters_scale" -> dedupClustersScale _,
    "d13_semantic_clusters" -> d13SemanticClusters _,
  )

  private def minExprs: String = (0 until K).map(i =>
    s"MIN((sid * ${aCoef(i)} + ${bCoef(i)}) % $P) AS min_$i").mkString(",\n               ")

  /** The full (4×2, 2×4) banding-sweep oracle over a caller-supplied
    * `ids(doc_id, sid)` CTE chain — shared by d17 (dictionary sids) and
    * d21 (portable md5-prefix sids). Replays [[lshTuningOver]] column
    * for column: per config the band self-join candidates, the
    * sid-intersection verification, and the precision/recall report. */
  private def lshSweepSqlOver(idsCtes: String): String = {
    def cfgCtes(b: Int, r: Int): String = {
      val tag = s"$b$r"
      val bandSelects = (0 until b).map { i =>
        val key = (0 until r).map(j => s"CAST(min_${i * r + j} AS VARCHAR)")
          .mkString(" || ':' || ")
        s"SELECT doc_id, $i AS band, $key AS bkey FROM sig"
      }.mkString("\n            UNION ALL\n            ")
      s"""bands$tag AS (
            $bandSelects),
          cand$tag AS (
            SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
            FROM bands$tag x JOIN bands$tag y
              ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
          ver$tag AS (
            SELECT i.id1, i.id2
            FROM (SELECT c.id1, c.id2, COUNT(*) AS inter
                  FROM cand$tag c
                  JOIN ids a ON a.doc_id = c.id1
                  JOIN ids b2 ON b2.doc_id = c.id2 AND a.sid = b2.sid
                  GROUP BY c.id1, c.id2) i
            JOIN sizes s1 ON s1.doc_id = i.id1
            JOIN sizes s2 ON s2.doc_id = i.id2
            WHERE i.inter * 2 >= (s1.n + s2.n - i.inter))"""
    }
    def cfgRow(b: Int, r: Int): String = {
      val tag = s"$b$r"
      s"""SELECT 'b${b}r$r' AS config, $b AS b, $r AS r,
             (SELECT COUNT(*) FROM cand$tag) AS n_candidates,
             (SELECT COUNT(*) FROM ver$tag) AS n_verified,
             CAST((SELECT COUNT(*) FROM ver$tag) AS DOUBLE)
               / (SELECT COUNT(*) FROM cand$tag) AS precision,
             (SELECT COUNT(*) FROM planted) AS n_planted,
             (SELECT COUNT(*) FROM planted p
              JOIN cand$tag c ON p.id1 = c.id1 AND p.id2 = c.id2)
               AS n_planted_found,
             CAST((SELECT COUNT(*) FROM planted p
                   JOIN cand$tag c ON p.id1 = c.id1 AND p.id2 = c.id2) AS DOUBLE)
               / (SELECT COUNT(*) FROM planted) AS recall"""
    }
    s"""WITH $corpusSql,
        $shinglesSql,
        $idsCtes,
        sig AS (SELECT doc_id, $minExprs FROM ids GROUP BY doc_id),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM ids GROUP BY doc_id),
        planted AS (
          SELECT doc_id AS id1, doc_id + 1000000 AS id2
          FROM documents WHERE doc_id % 10 = 0
          UNION ALL
          SELECT doc_id, doc_id + 2000000 FROM documents WHERE doc_id % 10 = 5),
        ${cfgCtes(4, 2)},
        ${cfgCtes(2, 4)}
        ${cfgRow(4, 2)}
        UNION ALL
        ${cfgRow(2, 4)}"""
  }

  /** The d02 candidate/verify chain as reusable CTE text (through the
    * verified near-pair set `near`), over a caller-supplied corpus CTE —
    * d02/d09 pass the planted-copies corpus, d12 the index ∪ incoming one. */
  private def lshPairCtesFor(corpus: String): String =
    s"""$corpus,
          $shinglesSql,
          $shingleDictSql,
          ids AS (SELECT doc_id, sid FROM shingle JOIN dict USING (shingle)),
          sig AS (SELECT doc_id, $minExprs FROM ids GROUP BY doc_id),
          bands AS (
            ${(0 until K / 2).map(b =>
              s"SELECT doc_id, $b AS band, CAST(min_${2 * b} AS STRING) || ':' || CAST(min_${2 * b + 1} AS STRING) AS bkey FROM sig")
              .mkString("\n            UNION ALL\n            ")}),
          cand AS (
            SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
            FROM bands x JOIN bands y
              ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
          sizes AS (SELECT doc_id, COUNT(*) AS n FROM ids GROUP BY doc_id),
          inter AS (
            SELECT c.id1, c.id2, COUNT(*) AS inter
            FROM cand c
            JOIN ids a ON a.doc_id = c.id1
            JOIN ids b ON b.doc_id = c.id2 AND a.sid = b.sid
            GROUP BY c.id1, c.id2),
          near AS (
            SELECT i.id1, i.id2
            FROM inter i
            JOIN sizes s1 ON s1.doc_id = i.id1
            JOIN sizes s2 ON s2.doc_id = i.id2
            WHERE i.inter * 2 >= (s1.n + s2.n - i.inter))"""

  private def lshPairCtes: String = lshPairCtesFor(corpusSql)

  /** The EXACT all-pairs true-jaccard near-pair set over a
    * caller-supplied `corpus` CTE — `truenear(id1, id2, inter, n1, n2)`
    * from one shingle equi-self-join, with NO banding anywhere.
    *
    * This is the r9 oracle device for the xxhash64 scale twins
    * (d07/d10/d18/d20/d22): their pair pipelines verify TRUE jaccard
    * (map-side `array_intersect` on raw shingles), so their survivor
    * sets equal this exact set iff the banding achieved full recall of
    * true ≥0.5-jaccard pairs — which the 4×2 minhash banding does on
    * the fixture corpus (p01's composed oracle first proved it at
    * sf0.01). Each oracle built on this CTE therefore checks BOTH the
    * pipeline's arithmetic and that recall property, with no dependence
    * on either hash family's candidate generation. */
  private[graft] def exactNearCtesFor(corpus: String): String =
    s"""$corpus,
          $shinglesSql,
          tsizes AS (SELECT doc_id, COUNT(*) AS n FROM shingle GROUP BY doc_id),
          tinter AS (
            SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS inter
            FROM shingle a JOIN shingle b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
          truenear AS (
            SELECT i.id1, i.id2, i.inter, s1.n AS n1, s2.n AS n2
            FROM tinter i
            JOIN tsizes s1 ON s1.doc_id = i.id1
            JOIN tsizes s2 ON s2.doc_id = i.id2
            WHERE i.inter * 2 >= (s1.n + s2.n - i.inter))"""

  /** The winnowing chain (tokens → grams → md5 → packed window-min →
    * anchor positions → anchor hashes) as oracle CTE text — the SQL
    * twin of [[winnowAnchors]], shared by the d29 and d30 oracles.
    * Prepend `corpusSql`. */
  private def winnowAncCtes: String = {
    val K = WinnowK; val W = WinnowW
    s"""base AS (
            SELECT doc_id, ${TextAnalysis.tokensSql} AS ts,
                   len(${TextAnalysis.tokensSql}) AS n_tokens
            FROM corpus WHERE len(${TextAnalysis.tokensSql}) >= ${K + W - 1}),
          grams AS (
            SELECT doc_id, n_tokens - $K + 1 AS n_grams, ts,
                   unnest(range(0, n_tokens - $K + 1)) AS p
            FROM base),
          gh AS (
            SELECT doc_id, n_grams, p,
                   md5(array_to_string(ts[(p + 1):(p + $K)], ' ')) AS h
            FROM grams),
          keyed AS (
            SELECT *, CAST('0x' || substr(h, 1, 5) AS BIGINT) * 8796093022208
                        + (8796093022207 - p) AS key
            FROM gh),
          wm AS (
            SELECT doc_id, n_grams, p,
                   MIN(key) OVER (PARTITION BY doc_id ORDER BY p
                                  ROWS BETWEEN CURRENT ROW AND ${W - 1} FOLLOWING) AS wmin
            FROM keyed),
          anchors AS (
            SELECT DISTINCT doc_id, n_grams, 8796093022207 - (wmin % 8796093022208) AS apos
            FROM wm WHERE p <= n_grams - $W),
          anc AS (
            SELECT a.doc_id, a.n_grams, g.h
            FROM anchors a JOIN gh g ON g.doc_id = a.doc_id AND g.p = a.apos)"""
  }

  /** The incremental admit decision replayed exactly: exact matches via
    * md5, near matches via the banding-free all-pairs true-jaccard
    * device restricted to index-side partners — shared verbatim by d22
    * (one-shot) and d32 (streamed), since the decision is provably
    * batch-tiling invariant. */
  private lazy val incrementalOracleSql: String =
    s"""WITH ${exactNearCtesFor(incomingCorpusSql)},
        batch AS (SELECT doc_id, text FROM corpus WHERE doc_id >= 1000000),
        idx_hash AS (
          SELECT md5(text) AS h, doc_id AS idx_id
          FROM corpus WHERE doc_id < 1000000),
        exact_hits AS (
          SELECT b.doc_id, MIN(i.idx_id) AS exact_match
          FROM (SELECT doc_id, md5(text) AS h FROM batch) b
          JOIN idx_hash i USING (h)
          GROUP BY b.doc_id),
        near_hits AS (
          SELECT id2 AS doc_id, MIN(id1) AS near_match
          FROM truenear
          WHERE id1 < 1000000 AND id2 >= 1000000
          GROUP BY id2)
        SELECT b.doc_id,
               exact_match IS NOT NULL AS is_exact_dup,
               near_match IS NOT NULL AS is_near_dup,
               COALESCE(exact_match, near_match) AS matched_id,
               (exact_match IS NULL AND near_match IS NULL) AS admit
        FROM batch b
        LEFT JOIN exact_hits USING (doc_id)
        LEFT JOIN near_hits USING (doc_id)"""

  val oracles: Map[String, String] = Map(
    "d29_winnow_fingerprint" ->
      s"""WITH $corpusSql,
          ${winnowAncCtes},
          sh AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM anc GROUP BY h)
          SELECT doc_id, CAST(MIN(n_grams) AS BIGINT) AS n_grams,
                 COUNT(*) AS n_anchors,
                 CAST(COUNT(*) AS DOUBLE) / MIN(n_grams) AS density,
                 CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
          FROM anc JOIN sh USING (h) GROUP BY doc_id""",
    // same anchor chain; boilerplate-capped distinct (doc, hash) pairs,
    // containment = shared / smaller doc's distinct anchor count
    "d30_containment_dedup" ->
      s"""WITH $corpusSql,
          $winnowAncCtes,
          sh AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM anc GROUP BY h),
          doch AS (
            SELECT DISTINCT a.doc_id, a.h
            FROM anc a JOIN sh USING (h) WHERE sh.nd <= $AnchorDocCap),
          perdoc AS (SELECT doc_id, COUNT(*) AS na FROM doch GROUP BY doc_id),
          shared AS (
            SELECT x.doc_id AS id1, y.doc_id AS id2, COUNT(*) AS n_shared
            FROM doch x JOIN doch y ON x.h = y.h AND x.doc_id < y.doc_id
            GROUP BY 1, 2)
          SELECT s.id1, s.id2, s.n_shared, p1.na AS n1, p2.na AS n2,
                 s.n_shared * 100.0 / LEAST(p1.na, p2.na) AS containment_pct
          FROM shared s
          JOIN perdoc p1 ON p1.doc_id = s.id1
          JOIN perdoc p2 ON p2.doc_id = s.id2
          WHERE s.n_shared * 2 >= LEAST(p1.na, p2.na)""",
    "d27_repeated_spans" -> {
      val K = RepSpanK
      s"""WITH $corpusSql,
          base AS (
            SELECT doc_id, ${TextAnalysis.tokensSql} AS ts,
                   len(${TextAnalysis.tokensSql}) AS n_tokens
            FROM corpus WHERE len(${TextAnalysis.tokensSql}) >= $K),
          wins AS (
            SELECT doc_id, n_tokens, ts,
                   unnest(range(0, n_tokens - $K + 1)) AS p
            FROM base),
          winh AS (
            SELECT doc_id, n_tokens, p,
                   md5(array_to_string(ts[(p + 1):(p + $K)], ' ')) AS h
            FROM wins),
          rep AS (SELECT h FROM winh GROUP BY h HAVING COUNT(*) > 1),
          flagged AS (SELECT w.doc_id, w.n_tokens, w.p FROM winh w JOIN rep USING (h)),
          gaps AS (
            SELECT doc_id, n_tokens, p,
                   CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > $K
                        THEN 1 ELSE 0 END AS gap
            FROM flagged),
          isl AS (
            SELECT doc_id, n_tokens, p,
                   SUM(gap) OVER (PARTITION BY doc_id ORDER BY p) AS island
            FROM gaps),
          spans AS (
            SELECT doc_id, n_tokens, island, MAX(p) + $K - MIN(p) AS span_len
            FROM isl GROUP BY 1, 2, 3)
          SELECT doc_id, COUNT(*) AS n_spans,
                 CAST(SUM(span_len) AS BIGINT) AS rep_tokens,
                 CAST(n_tokens AS BIGINT) AS n_tokens,
                 CAST(SUM(span_len) AS DOUBLE) / n_tokens AS rep_frac
          FROM spans GROUP BY doc_id, n_tokens"""
    },
    "d14_passage_dedup" -> {
      val W = PassageW
      s"""WITH $corpusSql,
          toks AS (
            SELECT doc_id, ${TextAnalysis.tokensSql} AS ts FROM corpus),
          idx AS (
            SELECT doc_id, ts, len(ts) AS n_tokens,
                   unnest(range(0, (len(ts) + ${W - 1}) // $W)) AS chunk_idx
            FROM toks),
          chunks AS (
            SELECT doc_id, n_tokens, chunk_idx,
                   md5(array_to_string(ts[(chunk_idx * $W + 1):(chunk_idx * $W + $W)], ' ')) AS h,
                   LEAST($W, n_tokens - chunk_idx * $W) AS clen
            FROM idx),
          flagged AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, chunk_idx) AS rn
            FROM chunks)
          SELECT doc_id, COUNT(*) AS n_chunks,
                 CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
                 CAST(SUM(CASE WHEN rn = 1 THEN clen ELSE 0 END) AS DOUBLE)
                   / MIN(n_tokens) AS retained_frac
          FROM flagged GROUP BY 1"""
    },
    "d17_lsh_tuning" -> lshSweepSqlOver(
      s"""$shingleDictSql,
          ids AS (SELECT doc_id, sid FROM shingle JOIN dict USING (shingle))"""),
    // d31: the same deletion-neighborhood blocking, cap, and levenshtein
    // verify replayed over the same planted vocabulary
    "d31_fuzzy_join" ->
      """WITH base AS (
           SELECT DISTINCT tok FROM (
             SELECT unnest(string_split_regex(text, '\s+')) AS tok
             FROM documents)
           WHERE length(tok) >= 4),
         seeds AS (
           SELECT tok FROM base
           WHERE length(tok) >= 5
             AND CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 3 = 0),
         planted AS (
           SELECT substr(tok, 1, 1) || substr(tok, 3) AS tok FROM seeds
           UNION ALL
           SELECT substr(tok, 1, 2) || 'z' || substr(tok, 4) FROM seeds
           UNION ALL
           SELECT substr(tok, 1, 1) || tok FROM seeds),
         vocab AS (
           SELECT DISTINCT tok FROM (
             SELECT tok FROM base UNION ALL SELECT tok FROM planted)),
         vars AS (
           SELECT DISTINCT tok, variant FROM (
             SELECT tok, tok AS variant FROM vocab
             UNION ALL
             SELECT tok, substr(tok, 1, i) || substr(tok, i + 2) AS variant
             FROM (SELECT tok, unnest(range(0, length(tok))) AS i FROM vocab))),
         big AS (
           SELECT variant FROM vars GROUP BY 1 HAVING COUNT(*) > 100),
         kept AS (
           SELECT tok, variant FROM vars
           WHERE variant NOT IN (SELECT variant FROM big)),
         cand AS (
           SELECT a.tok AS t1, b.tok AS t2, COUNT(*) AS n_shared_variants
           FROM kept a JOIN kept b
             ON a.variant = b.variant AND a.tok < b.tok
           GROUP BY 1, 2)
         SELECT t1, t2, n_shared_variants
         FROM cand WHERE levenshtein(t1, t2) <= 1""",
    // d21 oracle (r10): the identical sweep with the dictionary swapped
    // for the portable md5-prefix sid — same banding, same verification,
    // same report arithmetic, so every column (candidate counts
    // included) replays exactly.
    "d21_lsh_tuning_scale" -> lshSweepSqlOver(
      s"""ids AS (SELECT doc_id,
                CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT) % $P AS sid
              FROM shingle)"""),
    "d16_normalized_dedup" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 3000000,
                  upper(substring(text, 1, 10)) || substring(text, 11) || '  !!'
           FROM documents WHERE doc_id % 10 = 3),
         hashed AS (
           SELECT doc_id, md5(text) AS raw_h,
                  md5(trim(regexp_replace(regexp_replace(lower(text),
                        '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_h
           FROM corpus),
         by_norm AS (
           SELECT norm_h, COUNT(*) AS n_same_norm,
                  COUNT(DISTINCT raw_h) AS n_raw_variants,
                  MIN(doc_id) AS keeper
           FROM hashed GROUP BY 1)
         SELECT h.doc_id, b.n_same_norm, b.n_raw_variants,
                h.doc_id = b.keeper AS is_keeper
         FROM hashed h JOIN by_norm b USING (norm_h)""",
    "d15_minhash_estimate" -> {
      val agreeSql = (0 until K).map(i =>
        s"(CASE WHEN a.min_$i = b.min_$i THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH $corpusSql,
          $shinglesSql,
          $shingleDictSql,
          ids AS (SELECT doc_id, sid FROM shingle JOIN dict USING (shingle)),
          sigs AS (
            SELECT doc_id,
               $minExprs
            FROM ids GROUP BY doc_id),
          pairs AS (
            SELECT doc_id AS id1, doc_id + 1000000 AS id2, 'exact' AS kind
            FROM documents WHERE doc_id % 10 = 0
            UNION ALL
            SELECT doc_id, doc_id + 2000000, 'near' FROM documents WHERE doc_id % 10 = 5
            UNION ALL
            SELECT doc_id, doc_id + 5, 'control' FROM documents WHERE doc_id % 20 = 0),
          sizes AS (SELECT doc_id, COUNT(*) AS n FROM ids GROUP BY doc_id),
          inter AS (
            SELECT p.id1, p.id2, COUNT(*) AS inter
            FROM pairs p
            JOIN ids x ON x.doc_id = p.id1
            JOIN ids y ON y.doc_id = p.id2 AND x.sid = y.sid
            GROUP BY p.id1, p.id2),
          est AS (
            SELECT p.kind, p.id1, p.id2,
                   ($agreeSql) * 100.0 / $K AS est_pct
            FROM pairs p
            JOIN sigs a ON a.doc_id = p.id1
            JOIN sigs b ON b.doc_id = p.id2)
          SELECT e.kind, e.id1, e.id2, e.est_pct,
                 COALESCE(i.inter, 0) * 100.0
                   / (s1.n + s2.n - COALESCE(i.inter, 0)) AS jacc_pct,
                 e.est_pct - COALESCE(i.inter, 0) * 100.0
                   / (s1.n + s2.n - COALESCE(i.inter, 0)) AS err_pct
          FROM est e
          LEFT JOIN inter i ON i.id1 = e.id1 AND i.id2 = e.id2
          JOIN sizes s1 ON s1.doc_id = e.id1
          JOIN sizes s2 ON s2.doc_id = e.id2"""
    },
    "d11_contamination" -> contaminationSql,
    // d28 is d11 with a bloom prefilter in front of the exact verify —
    // the output is defined to be identical, so it shares the oracle
    "d28_bloom_contamination" -> contaminationSql,
    // min-label propagation ≡ reachability: a node's cluster id is the
    // minimum over every label that can walk to it along dedup edges
    "d19_keep_best_dedup" ->
      s"""WITH RECURSIVE $lshPairCtes,
          exact AS (
            SELECT id1, id2 FROM (
              SELECT MIN(doc_id) OVER (PARTITION BY md5(text)) AS id1,
                     doc_id AS id2
              FROM corpus)
            WHERE id1 <> id2),
          edges AS (
            SELECT id1 AS src, id2 AS dst FROM near
            UNION SELECT id2, id1 FROM near
            UNION SELECT id1, id2 FROM exact
            UNION SELECT id2, id1 FROM exact),
          nodes AS (SELECT DISTINCT doc_id FROM corpus),
          walk(node, lab) AS (
            SELECT doc_id, doc_id FROM nodes
            UNION
            SELECT e.dst, w.lab FROM walk w JOIN edges e ON e.src = w.node),
          lab AS (SELECT node AS doc_id, MIN(lab) AS cluster_id
                  FROM walk GROUP BY node),
          sz AS (SELECT cluster_id, COUNT(*) AS cluster_size
                 FROM lab GROUP BY cluster_id),
          tk AS (
            SELECT doc_id,
                   CAST(len(list_distinct(string_split_regex(text, '\\s+'))) * 1000
                        + len(list_filter(string_split_regex(text, '\\s+'),
                              t -> t IN ('a', 'the'))) * 100
                        - length(regexp_replace(text, '[a-z\\s]', '', 'g')) * 10
                        AS DOUBLE)
                     / len(string_split_regex(text, '\\s+')) AS quality
            FROM corpus)
          SELECT l.doc_id, l.cluster_id, sz.cluster_size, tk.quality,
                 ROW_NUMBER() OVER (PARTITION BY l.cluster_id
                                    ORDER BY tk.quality DESC, l.doc_id) = 1
                   AS is_kept
          FROM lab l JOIN sz USING (cluster_id) JOIN tk USING (doc_id)
          WHERE sz.cluster_size > 1""",
    "d09_dedup_clusters" ->
      s"""WITH RECURSIVE $lshPairCtes,
          exact AS (
            SELECT id1, id2 FROM (
              SELECT MIN(doc_id) OVER (PARTITION BY md5(text)) AS id1,
                     doc_id AS id2
              FROM corpus)
            WHERE id1 <> id2),
          edges AS (
            SELECT id1 AS src, id2 AS dst FROM near
            UNION SELECT id2, id1 FROM near
            UNION SELECT id1, id2 FROM exact
            UNION SELECT id2, id1 FROM exact),
          nodes AS (SELECT DISTINCT doc_id FROM corpus),
          walk(node, lab) AS (
            SELECT doc_id, doc_id FROM nodes
            UNION
            SELECT e.dst, w.lab FROM walk w JOIN edges e ON e.src = w.node),
          lab AS (SELECT node AS doc_id, MIN(lab) AS cluster_id
                  FROM walk GROUP BY node),
          sz AS (SELECT cluster_id, COUNT(*) AS cluster_size
                 FROM lab GROUP BY cluster_id)
          SELECT l.doc_id, l.cluster_id, sz.cluster_size
          FROM lab l JOIN sz USING (cluster_id)""",
    // --- r9 exact-form oracles for the xxhash64 scale twins -----------
    // (see exactNearCtesFor: true-jaccard all-pairs, no banding; each
    // also asserts the map-side banding's full recall on the fixture)
    "d18_minhash_mapside" ->
      s"""WITH ${exactNearCtesFor(corpusSql)}
          SELECT id1, id2, inter, n1, n2 FROM truenear""",
    "d07_dedup_corpus" ->
      s"""WITH ${exactNearCtesFor(corpusSql)},
          drops AS (SELECT DISTINCT id2 AS doc_id FROM truenear),
          exact AS (
            SELECT md5(text) AS h, MIN(doc_id) AS keep_id
            FROM corpus GROUP BY 1)
          SELECT c.doc_id, c.text
          FROM corpus c
          JOIN exact e ON md5(c.text) = e.h AND c.doc_id = e.keep_id
          LEFT JOIN drops d ON d.doc_id = c.doc_id
          WHERE d.doc_id IS NULL""",
    "d10_dedup_clusters_scale" ->
      s"""WITH RECURSIVE ${exactNearCtesFor(corpusSql)},
          exact AS (
            SELECT id1, id2 FROM (
              SELECT MIN(doc_id) OVER (PARTITION BY md5(text)) AS id1,
                     doc_id AS id2
              FROM corpus)
            WHERE id1 <> id2),
          edges AS (
            SELECT id1 AS src, id2 AS dst FROM truenear
            UNION SELECT id2, id1 FROM truenear
            UNION SELECT id1, id2 FROM exact
            UNION SELECT id2, id1 FROM exact),
          nodes AS (SELECT DISTINCT doc_id FROM corpus),
          walk(node, lab) AS (
            SELECT doc_id, doc_id FROM nodes
            UNION
            SELECT e.dst, w.lab FROM walk w JOIN edges e ON e.src = w.node),
          lab AS (SELECT node AS doc_id, MIN(lab) AS cluster_id
                  FROM walk GROUP BY node),
          sz AS (SELECT cluster_id, COUNT(*) AS cluster_size
                 FROM lab GROUP BY cluster_id)
          SELECT l.doc_id, l.cluster_id, sz.cluster_size
          FROM lab l JOIN sz USING (cluster_id)""",
    "d20_keep_best_scale" ->
      s"""WITH RECURSIVE ${exactNearCtesFor(corpusSql)},
          exact AS (
            SELECT id1, id2 FROM (
              SELECT MIN(doc_id) OVER (PARTITION BY md5(text)) AS id1,
                     doc_id AS id2
              FROM corpus)
            WHERE id1 <> id2),
          edges AS (
            SELECT id1 AS src, id2 AS dst FROM truenear
            UNION SELECT id2, id1 FROM truenear
            UNION SELECT id1, id2 FROM exact
            UNION SELECT id2, id1 FROM exact),
          nodes AS (SELECT DISTINCT doc_id FROM corpus),
          walk(node, lab) AS (
            SELECT doc_id, doc_id FROM nodes
            UNION
            SELECT e.dst, w.lab FROM walk w JOIN edges e ON e.src = w.node),
          lab AS (SELECT node AS doc_id, MIN(lab) AS cluster_id
                  FROM walk GROUP BY node),
          sz AS (SELECT cluster_id, COUNT(*) AS cluster_size
                 FROM lab GROUP BY cluster_id),
          tk AS (
            SELECT doc_id,
                   CAST(len(list_distinct(string_split_regex(text, '\\s+'))) * 1000
                        + len(list_filter(string_split_regex(text, '\\s+'),
                              t -> t IN ('a', 'the'))) * 100
                        - length(regexp_replace(text, '[a-z\\s]', '', 'g')) * 10
                        AS DOUBLE)
                     / len(string_split_regex(text, '\\s+')) AS quality
            FROM corpus)
          SELECT l.doc_id, l.cluster_id, sz.cluster_size, tk.quality,
                 ROW_NUMBER() OVER (PARTITION BY l.cluster_id
                                    ORDER BY tk.quality DESC, l.doc_id) = 1
                   AS is_kept
          FROM lab l JOIN sz USING (cluster_id) JOIN tk USING (doc_id)
          WHERE sz.cluster_size > 1""",
    // d32 streams the same decision batch-by-batch; the per-doc
    // signature makes it batch-invariant, so the oracle is d22's
    "d32_stream_dedup" -> incrementalOracleSql,
    // d33 recovers the SAME decision set after a mid-stream compaction:
    // refusal + snapshot re-bootstrap + idempotent write must compose to
    // exactly d22's one-shot answer
    "d33_stream_dedup_recovery" -> incrementalOracleSql,
    "d22_incremental_scale" -> incrementalOracleSql,
    "d01_exact_dedup" ->
      s"""WITH $corpusSql
          SELECT md5(text) AS content_hash, MIN(doc_id) AS canonical_id,
                 COUNT(*) AS n_copies
          FROM corpus GROUP BY md5(text) HAVING COUNT(*) > 1""",
    "d02_minhash_lsh" ->
      s"""WITH $lshPairCtes
          SELECT i.id1, i.id2, i.inter, s1.n AS n1, s2.n AS n2,
                 i.inter * 100.0 / (s1.n + s2.n - i.inter) AS jacc_pct
          FROM inter i
          JOIN sizes s1 ON s1.doc_id = i.id1
          JOIN sizes s2 ON s2.doc_id = i.id2
          WHERE i.inter * 2 >= (s1.n + s2.n - i.inter)""",
    // d05's aug fixture + the s04 IVF assignment replayed over it, then
    // the same-cell min-id blocker rule — all exact-fold arithmetic
    "d24_semdedup" ->
      s"""WITH aug AS (
            SELECT vec_id, embedding FROM embeddings
            UNION ALL
            SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 20 = 0
            UNION ALL
            SELECT vec_id + 200000,
                   [-embedding[1]] || embedding[2:] AS embedding
            FROM embeddings WHERE vec_id % 20 = 10),
          cents AS (
            SELECT vec_id AS cid, embedding AS ce FROM aug
            WHERE vec_id < ${Similarity.NList}),
          scored AS (
            SELECT e.vec_id, e.embedding, c.cid,
                   ${Similarity.dotSql("e.embedding", "c.ce")} AS cdot
            FROM aug e CROSS JOIN cents c),
          assigned AS (
            SELECT vec_id, embedding, cid FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                           ORDER BY cdot DESC, cid) AS rn
              FROM scored) t WHERE rn = 1),
          blockers AS (
            SELECT b.vec_id, MIN(a.vec_id) AS blocker_id
            FROM assigned a JOIN assigned b USING (cid)
            WHERE a.vec_id < b.vec_id
              AND ${Similarity.cosineSql("a.embedding", "b.embedding")} >= $SemTau
            GROUP BY b.vec_id)
          SELECT s.vec_id, s.cid, bl.blocker_id IS NULL AS is_kept, bl.blocker_id
          FROM assigned s LEFT JOIN blockers bl USING (vec_id)""",
    // same dictionary sids, 32-bit sign-pack, 4x8-bit pigeonhole bands,
    "d03_simhash" ->
      s"""WITH $corpusSql,
          $shinglesSql,
          $shingleDictSql,
          ids AS (SELECT doc_id, sid FROM shingle JOIN dict USING (shingle))
          SELECT doc_id,
                 CAST(${(0 until SimBits).map(b =>
                   s"(CASE WHEN SUM(CASE WHEN (((sid + ${simAOff(b)}) * ${simMult(b)}) % $P) % 2 = 1 THEN 1 ELSE -1 END) > 0 THEN ${1L << b} ELSE 0 END)")
                   .mkString(" + ")} AS BIGINT) AS simhash
          FROM ids GROUP BY doc_id""",
    "d04_ngram_jaccard" ->
      s"""WITH $corpusSql,
          $shinglesSql,
          $shingleDictSql,
          ids AS (SELECT doc_id, sid FROM shingle JOIN dict USING (shingle)),
          pairs AS (
            SELECT doc_id AS id1, doc_id + 1000000 AS id2, 'exact' AS kind
            FROM documents WHERE doc_id % 10 = 0
            UNION ALL
            SELECT doc_id, doc_id + 2000000, 'near' FROM documents WHERE doc_id % 10 = 5
            UNION ALL
            SELECT doc_id, doc_id + 5, 'control' FROM documents WHERE doc_id % 20 = 0),
          sizes AS (SELECT doc_id, COUNT(*) AS n FROM ids GROUP BY doc_id),
          inter AS (
            SELECT p.id1, p.id2, COUNT(*) AS inter
            FROM pairs p
            JOIN ids a ON a.doc_id = p.id1
            JOIN ids b ON b.doc_id = p.id2 AND a.sid = b.sid
            GROUP BY p.id1, p.id2)
          SELECT p.kind, p.id1, p.id2, COALESCE(i.inter, 0) AS inter,
                 s1.n AS n1, s2.n AS n2,
                 COALESCE(i.inter, 0) * 100.0 / (s1.n + s2.n - COALESCE(i.inter, 0))
                      AS jacc_pct
          FROM pairs p
          LEFT JOIN inter i ON i.id1 = p.id1 AND i.id2 = p.id2
          JOIN sizes s1 ON s1.doc_id = p.id1
          JOIN sizes s2 ON s2.doc_id = p.id2""",
    // same aug/pair fixture as d05, clustered by recursive reachability
    // with min-label (the walk mirrors the d09 oracle)
    "d13_semantic_clusters" ->
      s"""WITH RECURSIVE aug AS (
            SELECT vec_id, embedding FROM embeddings
            UNION ALL
            SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 20 = 0
            UNION ALL
            SELECT vec_id + 200000,
                   [-embedding[1]] || embedding[2:] AS embedding
            FROM embeddings WHERE vec_id % 20 = 10),
          rawpairs AS (
            SELECT vec_id AS id1, vec_id + 100000 AS id2
            FROM embeddings WHERE vec_id % 20 = 0
            UNION ALL
            SELECT vec_id, vec_id + 200000 FROM embeddings WHERE vec_id % 20 = 10),
          near AS (
            SELECT p.id1, p.id2 FROM rawpairs p
            JOIN aug a ON a.vec_id = p.id1
            JOIN aug b ON b.vec_id = p.id2
            WHERE ${Similarity.cosineSql("a.embedding", "b.embedding")} >= 0.5),
          edges AS (
            SELECT id1 AS src, id2 AS dst FROM near
            UNION SELECT id2, id1 FROM near),
          nodes AS (SELECT vec_id FROM aug),
          walk(node, lab) AS (
            SELECT vec_id, vec_id FROM nodes
            UNION
            SELECT e.dst, w.lab FROM walk w JOIN edges e ON e.src = w.node),
          lab AS (SELECT node AS vec_id, MIN(lab) AS cluster_id
                  FROM walk GROUP BY node),
          sz AS (SELECT cluster_id, COUNT(*) AS cluster_size
                 FROM lab GROUP BY cluster_id)
          SELECT l.vec_id, l.cluster_id, sz.cluster_size,
                 l.vec_id = l.cluster_id AS is_representative
          FROM lab l JOIN sz USING (cluster_id)""",
    "d05_embedding_neardup" ->
      s"""WITH aug AS (
            SELECT vec_id, embedding FROM embeddings
            UNION ALL
            SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 20 = 0
            UNION ALL
            SELECT vec_id + 200000,
                   [-embedding[1]] || embedding[2:] AS embedding
            FROM embeddings WHERE vec_id % 20 = 10),
          pairs AS (
            SELECT vec_id AS id1, vec_id + 100000 AS id2, 'exact' AS kind
            FROM embeddings WHERE vec_id % 20 = 0
            UNION ALL
            SELECT vec_id, vec_id + 200000, 'flip' FROM embeddings WHERE vec_id % 20 = 10)
          SELECT p.kind, p.id1, p.id2, ${Similarity.cosineSql("a.embedding", "b.embedding")} AS cos_sim
          FROM pairs p
          JOIN aug a ON a.vec_id = p.id1
          JOIN aug b ON b.vec_id = p.id2
          WHERE ${Similarity.cosineSql("a.embedding", "b.embedding")} >= 0.5""",
    // same dictionary-LSH chain as d02, over index ∪ incoming batch; batch
    // ids are +1e6/+2e6/+3e6 so cross-boundary near pairs always have the
    // index doc on the id1 side
    "d12_incremental_dedup" ->
      s"""WITH ${lshPairCtesFor(incomingCorpusSql)},
          batch AS (SELECT doc_id, text FROM corpus WHERE doc_id >= 1000000),
          idx_hash AS (
            SELECT md5(text) AS h, doc_id AS idx_id
            FROM corpus WHERE doc_id < 1000000),
          exact_hits AS (
            SELECT b.doc_id, MIN(i.idx_id) AS exact_match
            FROM (SELECT doc_id, md5(text) AS h FROM batch) b
            JOIN idx_hash i USING (h)
            GROUP BY b.doc_id),
          near_hits AS (
            SELECT id2 AS doc_id, MIN(id1) AS near_match
            FROM near
            WHERE id1 < 1000000 AND id2 >= 1000000
            GROUP BY id2)
          SELECT b.doc_id,
                 exact_match IS NOT NULL AS is_exact_dup,
                 near_match IS NOT NULL AS is_near_dup,
                 COALESCE(exact_match, near_match) AS matched_id,
                 (exact_match IS NULL AND near_match IS NULL) AS admit
          FROM batch b
          LEFT JOIN exact_hits USING (doc_id)
          LEFT JOIN near_hits USING (doc_id)""",
  )
}

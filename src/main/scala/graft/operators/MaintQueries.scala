package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The incremental-maintenance tier AS oracle-checked queries: each
  * query runs a bootstrap → refresh chain through
  * [[graft.sinks.IdempotentMergeSink]] inside the query itself, reads
  * the maintained (or time-travelled) state back, and hash-compares it
  * against a from-scratch DuckDB replay. Until now the maintenance
  * invariant ("maintained ≡ from-scratch at every version") was
  * spec-pinned only; these put every delta kind through the driver's
  * correctness gate:
  *
  *  - `maint_pairs_refresh` — UPSERT deltas: the near-dup pair table
  *    bootstrapped from one md5-mod half of the working corpus and
  *    refreshed with the other must hash-equal the from-scratch build
  *    (the oracle is built by the same `jaccardCtesOver` generator as
  *    `dedup_ngram_jaccard`'s — zero aliasing drift possible);
  *  - `maint_knn_refresh` — upserts + DELETES: the mutual-kNN list
  *    table refreshed with a node batch (fresh lists for touched
  *    nodes, delete rows for evicted neighbors) must reproduce the
  *    from-scratch edge set (`graph_knn_edges`'s oracle);
  *  - `maint_bm25_df_time_travel` — ADDITIVE increments + time travel:
  *    three doc batches committed into the BM25 df table, read back
  *    `AS OF` version 2 — the answer counts exactly the first two
  *    batches' documents, proving a later commit is invisible to a
  *    historical read (the versionAsOf contract, oracle-replayed);
  *  - `maint_phash_refresh` — pure-insert fingerprints + additive
  *    pair table for the perceptual-hash family, against the full
  *    integer-DCT DuckDB replay;
  *  - `maint_spans_refresh` — gram inserts + additive df with
  *    NON-LOCAL span recomputation (cap-crossing retractions
  *    included), against the maximal-span replay;
  *  - `maint_pairs_time_travel` — UPSERT-chain time travel: `readAt`
  *    version 2 of a 3-commit pair chain, so BOTH delta kinds with a
  *    fold path have their historical reads oracle-checked;
  *  - `maint_knn_time_travel` — DELETE-bearing-chain time travel:
  *    `readAt` version 2 of a 3-commit kNN list chain whose deltas
  *    carry eviction delete rows, so the historical fold's removes
  *    anti-join (not just the upsert union) is oracle-checked;
  *  - `maint_pairs_vacuum_travel` — retention interaction: `readAt`
  *    of the oldest RETAINED version after `vacuum(keep=2)` really
  *    deleted the pre-compaction versions — historical reads survive
  *    snapshot expiry exactly as a table format promises.
  *
  * Together these put every [[IndexMaintenance]] family and every
  * delta kind the sink commits (upsert, delete, additive increment)
  * through the driver's DuckDB gate, not just the spec suite.
  *
  * The batch split is the repo's deterministic md5-hash-mod membership
  * (the calibration-sample expression, AnnSearch.scala's
  * `('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8))::BIGINT` twin), so
  * DuckDB reconstructs the same batches bit-for-bit. Each run commits
  * into a fresh temp root, materializes the answer with
  * `localCheckpoint()`, and deletes the root — re-runs never share
  * state, so the queries are safe under the bench's median loop.
  *
  * This is the reference's update flow made exactly-once and
  * versioned: its nightly job re-PUTs changed menu entities against
  * the served index (batch_processor.py:1044-1129, retried PUTs with
  * no idempotency guard) — here a retried batch is a structural no-op
  * and yesterday's index state remains a readable version.
  */
object MaintQueries {

  /** Deterministic md5-hash-mod class of an id — both engines evaluate
    * the identical expression (see [[AnnSearch]]'s calibration sample).
    */
  private def hmod(c: Column, m: Int): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long") % m

  private def hmodSql(c: String, m: Int): String =
    s"CAST(('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 8)) AS BIGINT) % $m"

  /** Run `build` against a fresh temp root, materialize its answer
    * (the maintained table is about to be deleted out from under the
    * lazy plan — `localCheckpoint` pins the rows first), and delete
    * the root even when a commit or the checkpoint THROWS — a failed
    * bench/verify run must not leave half-committed tables in tmpdir.
    */
  private def withRoot(tag: String)(build: String => DataFrame): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_maintq_$tag")
      .toAbsolutePath.toString
    try build(root).localCheckpoint()
    finally graft.sinks.IdempotentMergeSink
      .deleteRecursively(new java.io.File(root))
  }

  /** Upsert-delta maintenance vs from-scratch: bootstrap the near-dup
    * pair table from the md5-mod-class-2 half of the working corpus,
    * refresh with the class-0 half (batch-vs-all candidates, never
    * old-vs-old), read the maintained pairs. Oracle = the SAME
    * `jaccardCtesOver` generator as `dedup_ngram_jaccard`, built over
    * the working-subset CTE — maintained ≡ from-scratch, replayed by
    * DuckDB. (The working set is the md5-mod even half so the e2e
    * double-build stays a mid-tier bench cost; the invariant is
    * corpus-independent.)
    */
  def maintPairsRefresh(spark: SparkSession, dir: String): DataFrame =
    withRoot("pairs") { root =>
      val docs = Tables.documents(spark, dir).select("doc_id", "text")
        .filter(hmod(col("doc_id"), 2) === 0)
      val base = docs.filter(hmod(col("doc_id"), 4) === 2)
      val batch = docs.filter(hmod(col("doc_id"), 4) === 0)
      IndexMaintenance.bootstrap(spark, root, base)
      IndexMaintenance.refresh(spark, root, base, batch, "b2")
      IndexMaintenance.pairs(spark, root).orderBy("doc_a", "doc_b")
    }

  /** Upsert + DELETE maintenance vs from-scratch: bootstrap the kNN
    * list table from the md5-mod-class-2 half of the part nodes,
    * refresh with the class-0 half (evicted neighbors committed as
    * delete rows), and read the mutual edge set over the maintained
    * lists. Oracle = the same `knnEdgesCteOver` generator as
    * `graph_knn_edges`, built over the working-subset CTE.
    */
  def maintKnnRefresh(spark: SparkSession, dir: String): DataFrame =
    withRoot("knn") { root =>
      val nodes = GraphOps.partNodes(spark, dir)
        .filter(hmod(col("key"), 2) === 0)
      val base = nodes.filter(hmod(col("key"), 4) === 2)
      val batch = nodes.filter(hmod(col("key"), 4) === 0)
      IndexMaintenance.bootstrapKnn(spark, root, base)
      IndexMaintenance.refreshKnn(spark, root, base, batch, "b2")
      IndexMaintenance.knnEdges(spark, root).orderBy("a", "b")
    }

  /** Additive-increment maintenance + TIME TRAVEL: commit three doc
    * batches into the BM25 df table (bootstrap base, then two
    * `mergeAdditive` increment deltas), read the df relation AS OF
    * version 2. The answer counts exactly batches 1-2's documents —
    * the version-3 commit is invisible to the historical read, and the
    * additive chain folds through the coalesced re-sum path. Oracle =
    * per-term document frequency over the md5-mod {1,2,3} subset.
    */
  def maintBm25DfTimeTravel(spark: SparkSession, dir: String): DataFrame =
    withRoot("bm25") { root =>
      val docs = Tables.documents(spark, dir).select("doc_id", "text")
      val b1 = docs.filter(hmod(col("doc_id"), 4).isin(1, 2))
      val b2 = docs.filter(hmod(col("doc_id"), 4) === 3)
      val b3 = docs.filter(hmod(col("doc_id"), 4) === 0)
      IndexMaintenance.bootstrapBm25(spark, root, b1, "b1")
      IndexMaintenance.refreshBm25(spark, root, b2, "b2")
      IndexMaintenance.refreshBm25(spark, root, b3, "b3")
      IndexMaintenance.bm25DfAt(spark, root, 2).orderBy("term")
    }

  /** UPSERT-chain time travel — the [[maintBm25DfTimeTravel]]
    * counterpart for upsert deltas: three doc batches committed into
    * the pair table (bootstrap + two refresh deltas), read back AS OF
    * version 2 via `readAt`. The answer is the from-scratch pair build
    * over batches 1-2's documents — version 3's upserts fold into
    * nothing, proving the upsert chain's anti-join + union replay
    * stops at the requested version.
    */
  def maintPairsTimeTravel(spark: SparkSession, dir: String): DataFrame =
    withRoot("pairs_tt") { root =>
      val docs = Tables.documents(spark, dir).select("doc_id", "text")
        .filter(hmod(col("doc_id"), 2) === 0)
      val b1 = docs.filter(hmod(col("doc_id"), 8).isin(2, 6))
      val b2 = docs.filter(hmod(col("doc_id"), 8) === 4)
      val b3 = docs.filter(hmod(col("doc_id"), 8) === 0)
      IndexMaintenance.bootstrap(spark, root, b1)
      IndexMaintenance.refresh(spark, root, b1, b2, "b2")
      IndexMaintenance.refresh(spark, root, b1.unionByName(b2), b3, "b3")
      IndexMaintenance.pairsAt(spark, root, 2).orderBy("doc_a", "doc_b")
    }

  /** Pure-insert + ADDITIVE-pair maintenance for the perceptual-hash
    * family: bootstrap the fingerprint + DCT pair tables from the
    * md5-mod-class-2 half of the (re-encode-augmented) media, refresh
    * with the class-0 half ([[Multimodal.dctNewPairs]] — batch-vs-all,
    * never old-vs-old), read the maintained pair relation. Oracle =
    * the same `dctPairsOracleWhere` generator as
    * `multimodal_phash_dct_pairs`, filtered to the working subset —
    * the full integer-DCT replay, subset-filtered at the fingerprint.
    */
  def maintPhashRefresh(spark: SparkSession, dir: String): DataFrame =
    withRoot("phash") { root =>
      val media = Multimodal.augmentedMedia(spark, dir)
        .filter(hmod(col("doc_id"), 2) === 0)
      val base = media.filter(hmod(col("doc_id"), 4) === 2)
      val batch = media.filter(hmod(col("doc_id"), 4) === 0)
      IndexMaintenance.bootstrapPhash(spark, root, base)
      IndexMaintenance.refreshPhash(spark, root, batch, "b2")
      IndexMaintenance.dctPairs(spark, root).orderBy("doc_a", "doc_b")
    }

  /** Insert + additive-df maintenance with NON-LOCAL recomputation for
    * the exact-span family: bootstrap the positional-gram + gram-df
    * tables from the md5-mod-class-2 half of the corpus, refresh with
    * the class-0 half (grams insert, df increments ride
    * `mergeAdditive`), extract maximal cross-document spans over the
    * MAINTAINED relations — including any cap-crossing retractions the
    * batch causes, since eligibility reads the maintained df. Oracle =
    * the same `exactSpansCtesOver` generator as `dedup_exact_spans`,
    * over the working-subset CTE.
    */
  def maintSpansRefresh(spark: SparkSession, dir: String): DataFrame =
    withRoot("spans") { root =>
      val docs = Tables.documents(spark, dir).select("doc_id", "text")
        .filter(hmod(col("doc_id"), 2) === 0)
      val base = docs.filter(hmod(col("doc_id"), 4) === 2)
      val batch = docs.filter(hmod(col("doc_id"), 4) === 0)
      IndexMaintenance.bootstrapSpans(spark, root, base)
      IndexMaintenance.refreshSpans(spark, root, batch, "b2")
      IndexMaintenance.exactSpans(spark, root)
        .orderBy("doc_a", "doc_b", "start_a", "start_b")
    }

  /** The fixed node-count of [[maintKnnTimeTravel]]'s working slice:
    * the kNN build family's cost scales with its working set (banded
    * candidates), so a PROPORTIONAL md5-mod slice made this contract
    * query the fleet's most expensive (6.73 s at sf0.01, 3.68× at a
    * 5× corpus). The invariant under test — the historical fold
    * applies v2's deletions and hides v3 — is corpus-independent, so
    * the chain runs over the `KnnSliceN` md5-RANK-smallest part keys:
    * deterministic on both engines (ORDER BY md5(key) LIMIT n), and
    * constant-cost at any corpus ≥ n parts.
    */
  private[graft] val KnnSliceN = 512

  /** DELETE-bearing-chain time travel — the last (family × fold-path)
    * combination: three node batches committed into the kNN list table
    * (bootstrap + two refreshes, each refresh delta carrying fresh
    * lists AND eviction delete rows), the mutual edge set read back AS
    * OF version 2. The answer is the from-scratch kNN build over
    * batches 1-2's nodes: the v2 fold must APPLY v2's deletions
    * (neighbors evicted by batch 2 are gone) while v3's upserts and
    * deletions are both invisible — the historical read exercises the
    * removes anti-join, which [[maintPairsTimeTravel]]'s delete-free
    * upsert chain never does. Scoped to the fixed-size [[KnnSliceN]]
    * slice (see there); batches split by md5-mod-4 class within it.
    */
  def maintKnnTimeTravel(spark: SparkSession, dir: String): DataFrame =
    withRoot("knn_tt") { root =>
      // one 512-row materialization: the slice feeds six batch plans
      val slice = GraphOps.partNodes(spark, dir)
        .orderBy(md5(col("key").cast("string")))
        .limit(KnnSliceN)
        .localCheckpoint()
      val b1 = slice.filter(hmod(col("key"), 4).isin(1, 2))
      val b2 = slice.filter(hmod(col("key"), 4) === 3)
      val b3 = slice.filter(hmod(col("key"), 4) === 0)
      IndexMaintenance.bootstrapKnn(spark, root, b1)
      IndexMaintenance.refreshKnn(spark, root, b1, b2, "b2")
      IndexMaintenance.refreshKnn(spark, root, b1.unionByName(b2), b3, "b3")
      IndexMaintenance.knnEdgesAt(spark, root, 2).orderBy("a", "b")
    }

  /** Retained-version time travel AFTER VACUUM — the retention
    * interaction the spec suite covers but the driver gate (until now)
    * did not: a 4-commit pair chain (bootstrap v1, refresh v2, COMPACT
    * v3, refresh v4) is vacuumed with keep=2, which really deletes
    * v1-v2 (v3 is a base, so the retained chain's floor is v3 itself),
    * and the query answers `readAt(v3)` — the OLDEST retained version,
    * reconstructed with its entire pre-compaction history gone. The
    * answer equals the from-scratch build over batches 1-2's documents
    * (compaction and vacuum change the physical layout, never the
    * logical state), which is exactly [[maintPairsTimeTravel]]'s
    * oracle — the same subset replayed by DuckDB.
    */
  def maintPairsVacuumTravel(spark: SparkSession, dir: String): DataFrame =
    withRoot("pairs_vac") { root =>
      val docs = Tables.documents(spark, dir).select("doc_id", "text")
        .filter(hmod(col("doc_id"), 2) === 0)
      val b1 = docs.filter(hmod(col("doc_id"), 8).isin(2, 6))
      val b2 = docs.filter(hmod(col("doc_id"), 8) === 4)
      val b3 = docs.filter(hmod(col("doc_id"), 8) === 0)
      IndexMaintenance.bootstrap(spark, root, b1)
      IndexMaintenance.refresh(spark, root, b1, b2, "b2")
      require(graft.sinks.IdempotentMergeSink.compact(spark, root),
        "compact was a no-op — the v2 refresh did not commit a delta")
      IndexMaintenance.refresh(spark, root, b1.unionByName(b2), b3, "b3")
      graft.sinks.IdempotentMergeSink.vacuum(root, keep = 2)
      // the vacuum must have REMOVED the pre-compaction versions —
      // otherwise this query degenerates into maint_pairs_time_travel
      require(!java.nio.file.Files.exists(java.nio.file.Paths.get(root, "v=1")) &&
          !java.nio.file.Files.exists(java.nio.file.Paths.get(root, "v=2")),
        s"vacuum(keep=2) left v=1/v=2 in place at $root")
      IndexMaintenance.pairsAt(spark, root, 3).orderBy("doc_a", "doc_b")
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "maint_knn_time_travel" -> (maintKnnTimeTravel _),
    "maint_pairs_refresh" -> (maintPairsRefresh _),
    "maint_knn_refresh" -> (maintKnnRefresh _),
    "maint_bm25_df_time_travel" -> (maintBm25DfTimeTravel _),
    "maint_phash_refresh" -> (maintPhashRefresh _),
    "maint_spans_refresh" -> (maintSpansRefresh _),
    "maint_pairs_time_travel" -> (maintPairsTimeTravel _),
    "maint_pairs_vacuum_travel" -> (maintPairsVacuumTravel _))

  /** The from-scratch pair build over batches 1-2's documents — the
    * answer BOTH `maint_pairs_time_travel` (v2 read of a live chain)
    * and `maint_pairs_vacuum_travel` (read of the oldest retained
    * version after vacuum) must reproduce.
    */
  private val pairsBatch12Oracle: String =
    s"""WITH sub AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE ${hmodSql("doc_id", 2)} = 0 AND ${hmodSql("doc_id", 8)} <> 0),
       |${Dedup.jaccardCtesOver("sub")}
       |SELECT * FROM jpairs ORDER BY doc_a, doc_b""".stripMargin

  val oracles: Map[String, String] = Map(
    // maintained ≡ from-scratch: the oracle is the SAME CTE generator
    // the from-scratch query's oracle uses, over the working subset
    "maint_pairs_refresh" ->
      s"""WITH sub AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE ${hmodSql("doc_id", 2)} = 0),
         |${Dedup.jaccardCtesOver("sub")}
         |SELECT * FROM jpairs ORDER BY doc_a, doc_b""".stripMargin,
    "maint_knn_refresh" ->
      s"""WITH sub AS (
         |  SELECT p_partkey, p_retailprice FROM part
         |  WHERE ${hmodSql("p_partkey", 2)} = 0),
         |${GraphOps.knnEdgesCteOver("sub")}
         |SELECT a, b FROM edges ORDER BY a, b""".stripMargin,
    // the v2 state is the from-scratch build over batches 1-2's nodes:
    // within the fixed md5-rank slice, the hmod-4 classes {1,2} ∪ {3};
    // v3's class-0 nodes are invisible
    "maint_knn_time_travel" ->
      s"""WITH slice AS (
         |  SELECT p_partkey, p_retailprice FROM part
         |  ORDER BY md5(CAST(p_partkey AS VARCHAR)) LIMIT $KnnSliceN),
         |sub AS (
         |  SELECT p_partkey, p_retailprice FROM slice
         |  WHERE ${hmodSql("p_partkey", 4)} <> 0),
         |${GraphOps.knnEdgesCteOver("sub")}
         |SELECT a, b FROM edges ORDER BY a, b""".stripMargin,
    "maint_bm25_df_time_travel" ->
      s"""WITH sub AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE ${hmodSql("doc_id", 4)} <> 0),
         |terms AS (
         |  SELECT * FROM (
         |    SELECT doc_id,
         |      unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
         |    FROM sub)
         |  WHERE term <> ''),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2)
         |SELECT term, count(*) AS df FROM tf GROUP BY term ORDER BY term""".stripMargin,
    "maint_phash_refresh" ->
      Multimodal.dctPairsOracleWhere(s"${hmodSql("doc_id", 2)} = 0"),
    "maint_pairs_time_travel" -> pairsBatch12Oracle,
    // compaction + vacuum never change logical state: the retained
    // version's read equals the SAME from-scratch subset build, so
    // the two queries share one oracle definition (no copy to drift)
    "maint_pairs_vacuum_travel" -> pairsBatch12Oracle,
    "maint_spans_refresh" ->
      s"""WITH sub AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE ${hmodSql("doc_id", 2)} = 0),
         |${TextAnalysis.exactSpansCtesOver("sub")}
         |SELECT doc_a, doc_b, start_a, start_b, span_len
         |FROM spans ORDER BY doc_a, doc_b, start_a, start_b""".stripMargin)
}

package graft.operators

import graft.sinks.IdempotentMergeSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of the served near-dup pair index — the
  * piece that ties the serving tier to the ingest path: the
  * [[graft.sources.ArtifactStore]] artifacts answer queries, this
  * keeps them CURRENT as batches arrive, with exactly-once semantics.
  *
  * Contract (IndexMaintenanceSpec pins all of it):
  *  - `bootstrap` builds the pair table from the base corpus;
  *  - `refresh` merges ONLY the pairs an ingest batch introduces
  *    ([[Dedup.ngramJaccardNewPairs]] — batch-vs-all candidates, never
  *    old-vs-old), keyed so the merged table equals the from-scratch
  *    build over the combined corpus;
  *  - every merge rides [[IdempotentMergeSink]]: a retried batch is a
  *    structural no-op, a crashed write is invisible — the reference's
  *    retried-PUT reality applied to index maintenance;
  *  - component labels recompute over the MAINTAINED pair table (the
  *    cheap step — the expensive text-side work is incremental).
  *
  * At 100 TB this is the operating mode: the pair table and signature
  * index live as tables, each ingest batch pays work ∝ batch size ×
  * touched buckets, and policy queries ([[Dedup.dedupKeepBestServed]]
  * et al.) read the maintained relations.
  */
object IndexMaintenance {

  private def keyed(pairs: DataFrame): DataFrame =
    pairs.withColumn("pair_key",
      concat_ws(":", col("doc_a"), col("doc_b")))

  /** Build the pair table from the base corpus (first commit). */
  def bootstrap(spark: SparkSession, root: String, baseDocs: DataFrame,
      batchId: String = "bootstrap"): Boolean =
    // widen = false: the contract queries bootstrap fixed small slices,
    // where the parallelism floor is per-job overhead (see ngramJaccardOf)
    IdempotentMergeSink.merge(spark, root,
      keyed(Dedup.ngramJaccardOf(baseDocs, widen = false)), "pair_key", batchId)

  /** Merge one ingest batch's new pairs into the table under
    * `batchId`; false = already applied (the retry no-op).
    */
  def refresh(spark: SparkSession, root: String, baseDocs: DataFrame,
      batchDocs: DataFrame, batchId: String): Boolean =
    IdempotentMergeSink.merge(spark, root,
      keyed(Dedup.ngramJaccardNewPairs(baseDocs, batchDocs, widen = false)),
      "pair_key", batchId)

  /** The maintained pair relation (doc_a, doc_b, n_inter, jaccard). */
  def pairs(spark: SparkSession, root: String): DataFrame =
    IdempotentMergeSink.read(spark, root)
      .map(_.select("doc_a", "doc_b", "n_inter", "jaccard"))
      .getOrElse(throw new IllegalStateException(s"no committed pair table at $root"))

  /** Time-travel read of the pair relation as of version `v` — the
    * upsert-chain counterpart of [[bm25DfAt]]: the state folds the
    * base plus exactly the upsert deltas committed up to `v`.
    */
  def pairsAt(spark: SparkSession, root: String, v: Int): DataFrame =
    IdempotentMergeSink.readAt(spark, root, v)
      .select("doc_a", "doc_b", "n_inter", "jaccard")

  /** Component labels over the maintained pairs — recomputed, not
    * merged: the fixpoint over the pair relation is the cheap step
    * (pairs are ≪ corpus), and labels cannot be merged locally anyway
    * (one new edge can fuse two old components).
    */
  def labels(spark: SparkSession, root: String): DataFrame =
    Dedup.connectedComponents(pairs(spark, root).select("doc_a", "doc_b"))
      .select("doc_id", "component")

  // --- mutual-kNN graph maintenance (the knn_edges artifact's trickle
  // path). The maintained relation is the per-node adjacency LIST, not
  // the edge set: mutual-kNN edges are not additive (a new closer
  // neighbor evicts an old one from a node's top-K), but the set of
  // nodes a batch can touch IS bounded — batch nodes plus base nodes
  // whose current top-K a batch node can actually ENTER
  // ([[GraphOps.touchedByBatch]]: band reach tightened by each node's
  // worst maintained neighbor diff). refreshKnn recomputes lists for
  // exactly that set, deletes the evicted rows, and the cheap mutual
  // join over the maintained lists reproduces the from-scratch edge
  // set. ---

  private def listKeyed(lists: DataFrame): DataFrame =
    lists.withColumn("list_key", concat_ws(":", col("u"), col("v")))

  /** Build the kNN list table from the base (key, price) node
    * relation (first commit).
    */
  def bootstrapKnn(spark: SparkSession, root: String, baseNodes: DataFrame,
      batchId: String = "bootstrap"): Boolean =
    IdempotentMergeSink.merge(spark, root,
      listKeyed(GraphOps.knnListsSymmetric(baseNodes)), "list_key", batchId)

  /** Merge one node batch into the list table under `batchId`: new
    * lists for every touched node, deletes for their evicted rows.
    * `baseNodes` is the corpus BEFORE the batch; batch keys must be
    * new. False = already applied (the retry no-op).
    */
  def refreshKnn(spark: SparkSession, root: String, baseNodes: DataFrame,
      batchNodes: DataFrame, batchId: String): Boolean = {
    val maintained = IdempotentMergeSink.read(spark, root)
    val touched = baseNodes
      .join(GraphOps.touchedByBatch(baseNodes, batchNodes,
        maintained.map(_.select(col("u"), col("v"), col("diff")))),
        Seq("key"), "left_semi")
      .unionByName(batchNodes)
      // materialize the (small) touched set: its derivation embeds the
      // full-table worst-diff aggregation, and both the fresh-list
      // build and the evicted anti-join consume it — without the
      // checkpoint that aggregation runs twice per refresh
      .localCheckpoint()
    val fresh = GraphOps.knnListsOf(touched, baseNodes.unionByName(batchNodes))
      .localCheckpoint() // feeds both the upserts and the evicted anti-join
    val evicted = maintained
      .map(_.select(col("u"), col("v"), col("diff"))
        .join(touched.select(col("key").as("u")), Seq("u"), "left_semi")
        .join(fresh, Seq("u", "v"), "left_anti")
        .withColumn("op", lit("D")))
      .getOrElse(fresh.limit(0).withColumn("op", lit("D")))
    IdempotentMergeSink.merge(spark, root,
      listKeyed(fresh.withColumn("op", lit("I")).unionByName(evicted)),
      "list_key", batchId)
  }

  /** The maintained per-node adjacency lists (u, v). */
  def knnLists(spark: SparkSession, root: String): DataFrame =
    IdempotentMergeSink.read(spark, root)
      .map(_.select("u", "v"))
      .getOrElse(throw new IllegalStateException(s"no committed knn list table at $root"))

  /** Mutual-kNN edges over the maintained lists — the same join as the
    * inline build ([[GraphOps.mutualEdgesOf]]), recomputed over a
    * relation of ≤ K·n rows: the cheap step, like [[labels]].
    */
  def knnEdges(spark: SparkSession, root: String): DataFrame =
    GraphOps.mutualEdgesOf(knnLists(spark, root))

  /** Time-travel read of the mutual edge set as of version `v` — the
    * DELETE-bearing counterpart of [[pairsAt]]: the kNN chain's deltas
    * carry eviction delete rows alongside upserts, so the historical
    * fold exercises the removes anti-join path, not just the union.
    */
  def knnEdgesAt(spark: SparkSession, root: String, v: Int): DataFrame =
    GraphOps.mutualEdgesOf(
      IdempotentMergeSink.readAt(spark, root, v).select("u", "v"))

  // --- BM25 postings maintenance (the bm25_tf/df/dl artifacts'
  // trickle path). tf and dl are doc-keyed — a batch of NEW docs is a
  // pure insert. df is term-keyed and ADDITIVE: the refresh commits
  // per-term INCREMENTS through mergeAdditive, whose CAS loop sums the
  // deltas against whatever state won each attempt — so concurrent
  // maintainers of different batches cannot lose each other's counts
  // (the r10 read-modify-write upsert could: it baked the read version
  // into absolute df rows outside the commit loop). Each sub-table
  // commit is exactly-once under the shared batchId, so a crash
  // between the three merges resumes where it left off. ---

  private def tfRoot(root: String) = s"$root/tf"
  private def dfRoot(root: String) = s"$root/df"
  private def dlRoot(root: String) = s"$root/dl"

  /** The df sub-table's sink root — exposed so the vacuum/time-travel
    * contract query ([[MaintQueries.maintBm25VacuumTravel]]) can
    * compact and vacuum the ADDITIVE chain it then reads back.
    */
  private[operators] def bm25DfRoot(root: String): String = dfRoot(root)

  /** Build the three posting tables from the base corpus. The three
    * sub-table merges all read the one checkpointed tf relation and
    * commit to DISJOINT roots — they run as concurrent jobs
    * ([[IdempotentMergeSink.inParallel]], the §2.6 overlap), so one
    * merge's driver-side planning rides another's execution instead of
    * serializing 3 plan+job rounds per maintenance call.
    */
  def bootstrapBm25(spark: SparkSession, root: String, baseDocs: DataFrame,
      batchId: String = "bootstrap"): Boolean = {
    val tf = AnnSearch.bm25Tf(baseDocs).localCheckpoint() // feeds 3 merges
    IdempotentMergeSink.inParallel(Seq(
      () => IdempotentMergeSink.merge(spark, tfRoot(root),
        tf.withColumn("tf_key", concat_ws(":", col("doc_id"), col("term"))),
        "tf_key", batchId),
      () => IdempotentMergeSink.merge(spark, dfRoot(root),
        tf.groupBy(col("term")).agg(count(lit(1)).as("df")), "term", batchId),
      () => IdempotentMergeSink.merge(spark, dlRoot(root),
        tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl")), "doc_id", batchId)))
      .reduce(_ | _)
  }

  /** Merge one ingest batch of NEW docs into the posting tables:
    * insert its tf and dl rows, add its per-term df increments.
    * False = every sub-table had already applied the batch.
    */
  def refreshBm25(spark: SparkSession, root: String, batchDocs: DataFrame,
      batchId: String): Boolean = {
    val btf = AnnSearch.bm25Tf(batchDocs).localCheckpoint()
    // additive term counts as INCREMENTS: mergeAdditive rebases the
    // deltas inside its commit loop, so a concurrent maintainer's
    // df commit between our read and our rename cannot be overwritten
    // with stale absolutes — no maintainer lease needed
    if (IdempotentMergeSink.version(dfRoot(root)) == 0)
      throw new IllegalStateException(s"refreshBm25 before bootstrap at $root")
    // disjoint sub-table roots → concurrent jobs (see bootstrapBm25)
    IdempotentMergeSink.inParallel(Seq(
      () => IdempotentMergeSink.merge(spark, tfRoot(root),
        btf.withColumn("tf_key", concat_ws(":", col("doc_id"), col("term"))),
        "tf_key", batchId),
      () => IdempotentMergeSink.mergeAdditive(spark, dfRoot(root),
        btf.groupBy(col("term")).agg(count(lit(1)).as("df")), "term", batchId),
      () => IdempotentMergeSink.merge(spark, dlRoot(root),
        btf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl")), "doc_id", batchId)))
      .reduce(_ | _)
  }

  /** Time-travel read of the maintained per-term document-frequency
    * relation as of df-table version `v` — [[IdempotentMergeSink.readAt]]
    * over the additive increment chain: the state equals the df of
    * exactly the batches committed up to `v`, later commits invisible.
    */
  def bm25DfAt(spark: SparkSession, root: String, v: Int): DataFrame =
    IdempotentMergeSink.readAt(spark, dfRoot(root), v).select("term", "df")

  /** The maintained (tf, df, dl) posting relations — drop-in for
    * [[AnnSearch.bm25LexRanked]]'s inputs.
    */
  def bm25(spark: SparkSession, root: String): (DataFrame, DataFrame, DataFrame) = {
    def rel(r: String, cols: Seq[String]) = IdempotentMergeSink.read(spark, r)
      .map(_.select(cols.map(col): _*))
      .getOrElse(throw new IllegalStateException(s"no committed posting table at $r"))
    (rel(tfRoot(root), Seq("doc_id", "term", "tf")),
      rel(dfRoot(root), Seq("term", "df")),
      rel(dlRoot(root), Seq("doc_id", "dl")))
  }

  // --- DCT perceptual-hash maintenance (the phash_dct artifact's
  // trickle path). Fingerprints are per-row immutable map-side work →
  // a media batch is a pure insert; the pair table is ADDITIVE because
  // fingerprints never change — refresh merges only the batch-vs-all
  // banded pairs ([[Multimodal.dctNewPairs]]), never old-vs-old. ---

  private def fpRoot(root: String) = s"$root/fp"
  private def dctPairsRoot(root: String) = s"$root/pairs"

  /** Build the fingerprint + pair tables from the base media. */
  def bootstrapPhash(spark: SparkSession, root: String,
      baseMedia: org.apache.spark.sql.Dataset[Multimodal.MediaRow],
      batchId: String = "bootstrap"): Boolean = {
    val fp = Multimodal.dctFingerprintsOf(baseMedia).localCheckpoint()
    // disjoint sub-table roots → concurrent jobs (see bootstrapBm25)
    IdempotentMergeSink.inParallel(Seq(
      () => IdempotentMergeSink.merge(spark, fpRoot(root), fp, "doc_id", batchId),
      () => IdempotentMergeSink.merge(spark, dctPairsRoot(root),
        keyed(Multimodal.dctPairsOver(fp)), "pair_key", batchId)))
      .reduce(_ | _)
  }

  /** Merge one media batch: insert its fingerprints, add the pairs it
    * introduces. False = every sub-table had already applied the batch.
    */
  def refreshPhash(spark: SparkSession, root: String,
      batchMedia: org.apache.spark.sql.Dataset[Multimodal.MediaRow],
      batchId: String): Boolean = {
    val bfp = Multimodal.dctFingerprintsOf(batchMedia).localCheckpoint()
    // baseFp resolves its version set NOW (committed() is eager), so
    // the fp merge landing first cannot change what the pair merge
    // reads — the two commits are safely concurrent (see bootstrapBm25)
    val baseFp = IdempotentMergeSink.read(spark, fpRoot(root))
      .map(_.select("doc_id", "modality", "phash64"))
      .getOrElse(throw new IllegalStateException(s"refreshPhash before bootstrap at $root"))
    IdempotentMergeSink.inParallel(Seq(
      () => IdempotentMergeSink.merge(spark, fpRoot(root), bfp, "doc_id", batchId),
      () => IdempotentMergeSink.merge(spark, dctPairsRoot(root),
        keyed(Multimodal.dctNewPairs(bfp, baseFp)), "pair_key", batchId)))
      .reduce(_ | _)
  }

  /** The maintained perceptual pair relation. */
  def dctPairs(spark: SparkSession, root: String): DataFrame =
    IdempotentMergeSink.read(spark, dctPairsRoot(root))
      .map(_.select("modality", "doc_a", "doc_b", "hamming"))
      .getOrElse(throw new IllegalStateException(s"no committed dct pair table at $root"))

  // --- exact-span gram maintenance (the span_grams artifact's trickle
  // path). Positional grams are per-doc immutable map-side work → a
  // doc batch is a pure insert into the gram table; per-gram document
  // frequency is ADDITIVE (batch docs are new, so a batch's distinct
  // (doc, g) rows are pure increments) and rides mergeAdditive like
  // the BM25 df. The span extraction RECOMPUTES over the maintained
  // relations — spans cannot be merged locally (a gram crossing the
  // df cap retroactively deletes old pairs' hits, and one new hit can
  // fuse two islands on a diagonal), but the corpus-sized work (the
  // tokenize + explode scan) is what became incremental, and
  // eligibility comes free from the maintained df table instead of a
  // corpus-wide distinct + aggregate. ---

  private def spanGramsRoot(root: String) = s"$root/grams"
  private def spanDfRoot(root: String) = s"$root/gdf"

  private def gramKeyed(grams: DataFrame): DataFrame =
    grams.withColumn("gram_key", concat_ws(":", col("doc_id"), col("pos")))

  private def gramDfOf(grams: DataFrame): DataFrame =
    grams.select(col("doc_id"), col("g")).distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("gdf"))

  /** Build the gram + df tables from the base corpus. */
  def bootstrapSpans(spark: SparkSession, root: String, baseDocs: DataFrame,
      batchId: String = "bootstrap"): Boolean = {
    val g = TextAnalysis.spanGramsOver(baseDocs).localCheckpoint() // feeds 2 merges
    // disjoint sub-table roots → concurrent jobs (see bootstrapBm25)
    IdempotentMergeSink.inParallel(Seq(
      () => IdempotentMergeSink.merge(spark, spanGramsRoot(root),
        gramKeyed(g), "gram_key", batchId),
      () => IdempotentMergeSink.merge(spark, spanDfRoot(root),
        gramDfOf(g), "g", batchId)))
      .reduce(_ | _)
  }

  /** Merge one ingest batch of NEW docs: insert its positional grams,
    * add its per-gram df increments. False = every sub-table had
    * already applied the batch.
    */
  def refreshSpans(spark: SparkSession, root: String, batchDocs: DataFrame,
      batchId: String): Boolean = {
    val bg = TextAnalysis.spanGramsOver(batchDocs).localCheckpoint()
    if (IdempotentMergeSink.version(spanDfRoot(root)) == 0)
      throw new IllegalStateException(s"refreshSpans before bootstrap at $root")
    // increments rebased inside the commit loop — same concurrent-
    // maintainer convergence contract as the BM25 df; disjoint
    // sub-table roots → concurrent jobs (see bootstrapBm25)
    IdempotentMergeSink.inParallel(Seq(
      () => IdempotentMergeSink.merge(spark, spanGramsRoot(root),
        gramKeyed(bg), "gram_key", batchId),
      () => IdempotentMergeSink.mergeAdditive(spark, spanDfRoot(root),
        gramDfOf(bg), "g", batchId)))
      .reduce(_ | _)
  }

  /** The maintained positional-gram relation (doc_id, pos, g). */
  def spanGrams(spark: SparkSession, root: String): DataFrame =
    IdempotentMergeSink.read(spark, spanGramsRoot(root))
      .map(_.select("doc_id", "pos", "g"))
      .getOrElse(throw new IllegalStateException(s"no committed gram table at $root"))

  /** The maintained per-gram document-frequency relation (g, gdf). */
  def spanGramDf(spark: SparkSession, root: String): DataFrame =
    IdempotentMergeSink.read(spark, spanDfRoot(root))
      .map(_.select("g", "gdf"))
      .getOrElse(throw new IllegalStateException(s"no committed gram df table at $root"))

  /** Maximal cross-document spans over the maintained relations —
    * equals [[TextAnalysis.dedupExactSpans]] over the combined corpus
    * (cap crossings included: eligibility reads the maintained df).
    */
  def exactSpans(spark: SparkSession, root: String): DataFrame =
    TextAnalysis.spansFromGramsWithDf(
      spanGrams(spark, root), spanGramDf(spark, root))
}

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
    IdempotentMergeSink.merge(spark, root,
      keyed(Dedup.ngramJaccardOf(baseDocs)), "pair_key", batchId)

  /** Merge one ingest batch's new pairs into the table under
    * `batchId`; false = already applied (the retry no-op).
    */
  def refresh(spark: SparkSession, root: String, baseDocs: DataFrame,
      batchDocs: DataFrame, batchId: String): Boolean =
    IdempotentMergeSink.merge(spark, root,
      keyed(Dedup.ngramJaccardNewPairs(baseDocs, batchDocs)),
      "pair_key", batchId)

  /** The maintained pair relation (doc_a, doc_b, n_inter, jaccard). */
  def pairs(spark: SparkSession, root: String): DataFrame =
    IdempotentMergeSink.read(spark, root)
      .map(_.select("doc_a", "doc_b", "n_inter", "jaccard"))
      .getOrElse(throw new IllegalStateException(s"no committed pair table at $root"))

  /** Component labels over the maintained pairs — recomputed, not
    * merged: the fixpoint over the pair relation is the cheap step
    * (pairs are ≪ corpus), and labels cannot be merged locally anyway
    * (one new edge can fuse two old components).
    */
  def labels(spark: SparkSession, root: String): DataFrame =
    Dedup.connectedComponents(pairs(spark, root).select("doc_a", "doc_b"))
      .select("doc_id", "component")
}

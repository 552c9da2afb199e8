package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Idempotent keyed-MERGE table layout — the write-back contract the
  * reference's PUT loop implies (api-client.py: every batch re-PUTs
  * its product updates, and the warehouse must not double-apply them
  * when a batch retries after a timeout). Two disciplines compose:
  *
  *  - **Versioned commits, marker last.** Each merge writes a complete
  *    new table state under `v=<n>/` and only then writes the commit
  *    marker (`_GRAFT_COMMIT`). Readers resolve the HIGHEST COMMITTED
  *    version; a crash mid-write leaves an unmarked directory that no
  *    reader ever sees and the next merge simply overwrites — the
  *    marker-file-last protocol every table format (Delta/Iceberg
  *    commit logs, Hadoop commit algorithms) builds on.
  *  - **Batch-id dedup.** Every merge call carries a `batchId`; applied
  *    ids are recorded inside the commit marker and a re-run of an
  *    already-committed batch is a structural NO-OP (no read, no
  *    write, no new version) — the exactly-once discipline streaming
  *    `foreachBatch` sinks use, and the reason a retried PUT cannot
  *    double-count `n_changes`-style accumulations downstream.
  *
  * Merge semantics: updates UPSERT whole rows by `key`; rows whose
  * `op` column (when present) is "D" DELETE the key — the same
  * latest-op-wins contract as `etl_cdc_apply`, applied incrementally.
  * Within one updates batch the highest `seq` wins when a `seq`
  * column is present; otherwise updates are assumed key-unique.
  *
  * Local-filesystem rename stands in for the object-store commit
  * protocol; the marker-last + batch-id layers are what carry the
  * idempotence, not rename atomicity.
  */
object IdempotentMergeSink {

  private val Marker = "_GRAFT_COMMIT"

  /** Applied batch ids + version number of the newest committed
    * version, or None for an empty table root.
    */
  private def committed(root: String): Option[(Int, Seq[String])] = {
    val dirs = Option(new File(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v=")
        && new File(f, Marker).exists())
      .map(f => f.getName.stripPrefix("v=").toInt)
    if (dirs.isEmpty) None
    else {
      val v = dirs.max
      val ids = Files.readAllLines(
        Paths.get(root, s"v=$v", Marker), StandardCharsets.UTF_8)
      Some((v, ids.toArray(Array.empty[String]).toSeq))
    }
  }

  /** The newest committed state, or None for an empty table. */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    committed(root).map { case (v, _) => spark.read.parquet(s"$root/v=$v") }

  /** Version the newest commit carries (0 = empty table) — exposed so
    * a spec can assert "re-run produced NO new version".
    */
  def version(root: String): Int = committed(root).map(_._1).getOrElse(0)

  /** True when `batchId` is already applied — the re-run detector. */
  def applied(root: String, batchId: String): Boolean =
    committed(root).exists(_._2.contains(batchId))

  /** Merge `updates` into the table at `root` under `batchId`.
    * Returns true when the batch was applied, false for the
    * already-applied no-op path. Columns: `key` joins, optional "op"
    * ("D" deletes), optional "seq" orders within the batch (highest
    * wins); "op"/"seq" are control columns and are not persisted.
    */
  def merge(spark: SparkSession, root: String, updates: DataFrame,
      key: String, batchId: String): Boolean = {
    val cur = committed(root)
    if (cur.exists(_._2.contains(batchId))) return false // retry after success
    // within-batch latest-op-wins (mirror of the etl_cdc_apply window)
    val cols = updates.columns
    val ranked =
      if (cols.contains("seq")) {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(key)).orderBy(col("seq").desc)
        updates.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn", "seq")
      } else updates
    val (upserts, deletes) =
      if (ranked.columns.contains("op"))
        (ranked.filter(col("op") =!= "D").drop("op"),
          ranked.filter(col("op") === "D").select(col(key)))
      else (ranked, ranked.limit(0).select(col(key)))
    val newState = cur.map { case (v, _) => spark.read.parquet(s"$root/v=$v") }
      .map(_.join(ranked.select(col(key)), Seq(key), "left_anti")
        .unionByName(upserts))
      .getOrElse(upserts)
      .join(deletes, Seq(key), "left_anti")
    val nextV = cur.map(_._1).getOrElse(0) + 1
    val dir = s"$root/v=$nextV"
    // a crashed previous attempt may have left an unmarked dir — it was
    // never visible, so overwriting it IS the retry path
    newState.write.mode(SaveMode.Overwrite).parquet(dir)
    val ids = cur.map(_._2).getOrElse(Seq.empty) :+ batchId
    Files.write(Paths.get(dir, Marker),
      ids.mkString("\n").getBytes(StandardCharsets.UTF_8)) // marker LAST
    true
  }

  /** Retention: drop all committed versions older than the newest
    * `keep` (and any unmarked crash leftovers below them). The newest
    * version carries the full applied-batch-id list, so vacuuming old
    * versions never weakens the idempotence check — the same reason a
    * table format can expire snapshots without re-running commits.
    */
  def vacuum(root: String, keep: Int = 1): Unit = {
    require(keep >= 1, "must keep at least the newest committed version")
    committed(root).foreach { case (newest, _) =>
      Option(new File(root).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("v="))
        .filter(_.getName.stripPrefix("v=").toInt <= newest - keep)
        .foreach { d =>
          d.listFiles().foreach(_.delete())
          d.delete()
        }
    }
  }
}

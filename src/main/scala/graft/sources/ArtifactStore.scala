package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import scala.collection.concurrent.TrieMap

/** Write-once/serve-many index artifacts — the storage tier behind the
  * `*_indexed` / `*_served` operators. Production ANN and graph
  * serving never rebuilds its index inside the query: the mutual-kNN
  * edge relation, the IVF coarse quantizer and the PQ codebooks are
  * TRAINED once (the expensive corpus passes), persisted as bucketed
  * tables, and every subsequent query only pays the probe-side work —
  * the train-once/serve-many shape the reference itself runs (its
  * embedding build is one batch pass reused by every later lookup,
  * batch_processor.py:728-754). At 100 TB this is the difference
  * between "each graph query re-shuffles the corpus to rebuild edges"
  * and "seven queries read one bucketed edge table with zero
  * exchanges on the bucket key".
  *
  * Semantics: `ensure` builds AT MOST ONCE per (dataset, name) per
  * JVM — the first caller pays the build and the write, everyone else
  * (including re-runs of the same query in a bench loop) reads the
  * table. Tables are keyed by the dataset directory, so two scale
  * factors never share artifacts. Each JVM rebuilds from its own
  * session's plan (deterministic, so served ≡ self-contained —
  * ArtifactStoreSpec pins it), which also makes staleness impossible:
  * an artifact never outlives the process that derived it from the
  * source parquet.
  */
object ArtifactStore {

  /** (dataset dir, artifact name) → managed table name, per JVM. */
  private val built = TrieMap.empty[(String, String), String]

  /** Dataset path → a token stable within the JVM and safe in a table
    * identifier.
    */
  private def dirKey(dir: String): String =
    dir.toLowerCase.replaceAll("[^a-z0-9]+", "_").replaceAll("^_+|_+$", "")

  private[sources] def tableName(dir: String, name: String): String =
    s"graft_art_${dirKey(dir)}_$name"

  /** The build-once gate. `build` runs only for the first caller per
    * (dir, name); the result is written as a bucketed in-bucket-sorted
    * managed table (the [[Bucketing]] discipline — joins on `key`
    * against an equally-bucketed side are exchange-free) and every
    * caller gets the table scan back.
    */
  def ensure(spark: SparkSession, dir: String, name: String, key: String,
      buckets: Int)(build: => DataFrame): DataFrame = {
    val k = (dir, name)
    built.synchronized {
      if (!built.contains(k)) {
        val tbl = tableName(dir, name)
        dropOrphan(spark, tbl)
        build.write
          .mode(SaveMode.Overwrite)
          .bucketBy(buckets, key)
          .sortBy(key)
          .format("parquet")
          .saveAsTable(tbl)
        built(k) = tbl
      }
    }
    spark.table(built(k))
  }

  /** True when the artifact is already built in this JVM — lets a
    * trainer that produces SEVERAL artifacts in one pass (the PQ model
    * emits codes AND codebook) skip the whole pass when all its
    * outputs exist, without re-entering each `ensure` build.
    */
  def has(dir: String, name: String): Boolean = built.contains((dir, name))

  /** A previous JVM's warehouse dir for this table blocks `saveAsTable`
    * (the fresh in-memory metastore doesn't own it) — clear both the
    * catalog entry and the directory, the BucketingSpec discipline.
    */
  private def dropOrphan(spark: SparkSession, tbl: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val wh = java.net.URI.create(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    val dir = new java.io.File(wh, tbl)
    if (dir.exists()) {
      dir.listFiles().foreach(_.delete())
      dir.delete()
    }
  }
}

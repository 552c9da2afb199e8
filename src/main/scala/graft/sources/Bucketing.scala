package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: the storage-level answer to repeated
  * fact⋈fact joins at 100 TB. Writing both sides bucketed (and sorted)
  * by the join key means every future join on that key is
  * exchange-free — the shuffle is paid once at write time, not once
  * per query. The reference re-joins incoming articles against master
  * products on every batch run (batch_processor.py stages 0/1); with
  * the master side bucketed, those runs skip the big-side shuffle
  * entirely.
  */
object Bucketing {

  /** Write `df` as a bucketed, in-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — planner elides the
    * exchanges when bucket counts line up (verify with `.explain`:
    * SortMergeJoin with no ShuffleExchange above either scan).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}

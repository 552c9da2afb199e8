package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Hive-style partitioned parquet layout: the storage half of partition
  * pruning. Writing a 100 TB corpus partitioned by a low-cardinality
  * selective column (language, date, source) means a query filtering on
  * that column never touches the other partitions' files — the scan's
  * `PartitionFilters` eliminate directories before any I/O happens.
  * The reference processes per-retailer catalogs; retailer/category is
  * the natural partition key there.
  */
object PartitionedParquet {

  def write(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}

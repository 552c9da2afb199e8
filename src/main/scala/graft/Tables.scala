package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish parquet tables.
  *
  * All operators read through here so the scan layer stays in one place
  * (schema expectations, future bucketing / sorting hints, etc.).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** The physical type of events.parquet's `ts` column has varied across
    * driver testdata generations: TIMESTAMP(NANOS) (which Spark's
    * vectorized reader rejects — read nanos as long via the legacy flag
    * and truncate to micros, matching DuckDB) vs plain timestamp[us]
    * (TIMESTAMP_NTZ). Dispatch on the schema actually present so both
    * vintages yield the identical session-zone TimestampType `ts`.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw // already session-zone TimestampType
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Scale-adaptive parallelism floor for the heavy derivation chains
    * (minhash/verify, PQ/k-means training, fingerprinting): when the
    * input relation carries FEWER partitions than the session's
    * default parallelism — a small corpus read as one single-row-group
    * parquet split — every fused per-row stage downstream (shingle
    * explode, codebook scoring, DCT) and every consumer of a
    * subsequent `localCheckpoint` runs on ONE core while the rest
    * idle. Repartition to the default parallelism, HASHED ON THE CHAIN
    * KEY (never round-robin): a downstream groupBy/window/join keyed
    * on the same column then reuses the partitioning instead of adding
    * its own exchange, so the plan's exchange count does not grow.
    * At production scale the input already carries ≥ cores splits and
    * this is a structural no-op — no plan gains a shuffle at 100 TB.
    */
  def widened(df: DataFrame, key: String): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores, col(key)) else df
  }
}

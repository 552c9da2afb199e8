package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data
  * skipping — the lakehouse layout trick for tables queried on MORE
  * than one column: a linear sort on `a` gives perfect file-level
  * min/max pruning on `a` and none on `b`; interleaving the bits of
  * both keys clusters rows so every file covers a small RECTANGLE of
  * (a, b) space, and a selective predicate on either column (or both)
  * excludes most files by their parquet footer min/max alone.
  *
  * At 100 TB the scan-time win is decided at WRITE time by this
  * layout; readers need nothing special (plain parquet + the pushdown
  * Spark already does). The whole computation is expression-level
  * (two stat lookups + integer bit math inside codegen) and the write
  * is one range shuffle on the z-value.
  */
object ZOrder {

  private val Bits = 16

  /** Morton interleave of two pre-normalized [0, 2^16) int columns:
    * bit i of `x` lands at position 2i, bit i of `y` at 2i+1. A fold
    * over 2×16 shift/mask terms — pure integer expressions, stays in
    * whole-stage codegen.
    */
  def interleave16(x: Column, y: Column): Column =
    (0 until Bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Rescale a numeric column to [0, 2^16) given its min/max. */
  private def normalize(c: Column, cMin: Column, cMax: Column): Column =
    when(cMax === cMin, lit(0L)).otherwise(
      floor((c - cMin).cast("double") / (cMax - cMin).cast("double") * ((1 << Bits) - 1))
        .cast("long"))

  /** `df` with a `z` column: the Morton code of (c1, c2), each
    * min/max-normalized to 16 bits. The stats subquery is a 1-row
    * aggregate broadcast into the projection — one extra pass over the
    * column pair (or zero, if the caller passes cached table stats at
    * real scale).
    */
  def withZValue(df: DataFrame, c1: String, c2: String): DataFrame = {
    val stats = df.agg(
      min(col(c1)).as("min1"), max(col(c1)).as("max1"),
      min(col(c2)).as("min2"), max(col(c2)).as("max2"))
    df.crossJoin(broadcast(stats))
      .withColumn("z", interleave16(
        normalize(col(c1), col("min1"), col("max1")),
        normalize(col(c2), col("min2"), col("max2"))))
      .drop("min1", "max1", "min2", "max2")
  }

  /** Write `df` as parquet clustered on the z-curve of (c1, c2):
    * range-partition on `z` (equal-sized files along the curve), sort
    * within partitions, drop the helper column on disk.
    */
  def writeZOrdered(df: DataFrame, path: String, c1: String, c2: String,
      numFiles: Int): Unit =
    withZValue(df, c1, c2)
      .repartitionByRange(numFiles, col("z"))
      .sortWithinPartitions(col("z"))
      .drop("z")
      .write.mode("overwrite").parquet(path)
}

package graft

import graft.sources.ZOrder
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Z-order clustering: the measurable claim is file-level data
  * skipping — under a 2-D predicate, the fraction of files whose
  * per-file min/max bounding box intersects the predicate (the files a
  * footer-stats reader must open) is much smaller for the z-ordered
  * layout than for a linear single-column sort.
  */
class ZOrderSpec extends SparkTestBase {

  private def boxStats(path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(
        min("p_size").as("lo1"), max("p_size").as("hi1"),
        min("p_retailprice").as("lo2"), max("p_retailprice").as("hi2"))

  test("z-ordered files prune on both dimensions; linear sort prunes on one") {
    val dir = Files.createTempDirectory("graft-zorder").toString
    val part = Tables.part(spark, sfDir)
      .select("p_partkey", "p_size", "p_retailprice")
    val nFiles = 16
    ZOrder.writeZOrdered(part, s"$dir/z", "p_size", "p_retailprice", nFiles)
    part.repartitionByRange(nFiles, col("p_size"))
      .sortWithinPartitions(col("p_size"))
      .write.mode("overwrite").parquet(s"$dir/linear")

    val zBoxes = boxStats(s"$dir/z").cache()
    val lBoxes = boxStats(s"$dir/linear").cache()
    assert(zBoxes.count() == nFiles && lBoxes.count() == nFiles)

    // predicate selective in p_retailprice ONLY (middle 20% of the
    // observed range) — the dimension the linear layout does not
    // cluster: every linear file spans the full price range, so none
    // can be skipped
    val r = part.agg(
      min("p_retailprice"), max("p_retailprice"), min("p_size"), max("p_size")).head()
    val (pLo, pHi) = (r.getDouble(0), r.getDouble(1))
    val (b2lo, b2hi) = (pLo + 0.4 * (pHi - pLo), pLo + 0.6 * (pHi - pLo))
    def touching(boxes: DataFrame): Long =
      boxes.filter(col("hi2") >= b2lo && col("lo2") <= b2hi).count()
    val zTouch = touching(zBoxes)
    val lTouch = touching(lBoxes)
    assert(lTouch >= nFiles - 1, s"linear layout unexpectedly clustered price: $lTouch")
    assert(zTouch * 2 <= nFiles,
      s"z-order should let footer stats skip >=half the files, touched $zTouch/$nFiles")

    // and the z layout still prunes on p_size (box predicate on dim 1:
    // middle 20% of the size range)
    val (sLo, sHi) = (r.getInt(2).toDouble, r.getInt(3).toDouble)
    val (b1lo, b1hi) = (sLo + 0.4 * (sHi - sLo), sLo + 0.6 * (sHi - sLo))
    val zTouch1 = zBoxes.filter(col("hi1") >= b1lo && col("lo1") <= b1hi).count()
    assert(zTouch1 < nFiles, s"z-order lost all clustering on p_size: $zTouch1")

    // correctness: the layouts hold identical data
    val a = spark.read.parquet(s"$dir/z").orderBy("p_partkey").collect().toSeq
    val b = spark.read.parquet(s"$dir/linear").orderBy("p_partkey").collect().toSeq
    assert(a == b)
  }

  test("interleave16 is the Morton curve on small known values") {
    import spark.implicits._
    // (x=1, y=0) -> 1; (x=0, y=1) -> 2; (x=3, y=3) -> 15; (x=0b10, y=0b01) -> 0b0110 = 6
    val out = Seq((1L, 0L), (0L, 1L), (3L, 3L), (2L, 1L)).toDF("x", "y")
      .select(ZOrder.interleave16(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 2L, 15L, 6L))
  }
}

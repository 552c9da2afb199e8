package graft

import graft.sources.Compactor
import org.apache.spark.sql.functions._
import java.nio.file.Files

class CompactorSpec extends SparkTestBase {

  test("compaction collapses a many-file dataset without changing its content") {
    val dir = Files.createTempDirectory("graft-compact").toString
    val src = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_linenumber", "l_quantity")
    src.repartition(64).write.parquet(s"$dir/small") // simulate tiny-file append history
    val smallFiles = new java.io.File(s"$dir/small").listFiles().count(_.getName.endsWith(".parquet"))
    assert(smallFiles == 64)

    Compactor.compact(spark, s"$dir/small", s"$dir/big")
    val bigFiles = new java.io.File(s"$dir/big").listFiles().count(_.getName.endsWith(".parquet"))
    assert(bigFiles < 8, s"expected few files, got $bigFiles") // whole table << 128MB

    val a = spark.read.parquet(s"$dir/small")
    val b = spark.read.parquet(s"$dir/big")
    assert(a.count() == b.count())
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("schema-evolved dataset reads old files with nulls for new columns") {
    val dir = Files.createTempDirectory("graft-evolve").toString + "/data"
    import spark.implicits._
    Seq((1L, "alpha")).toDF("id", "name").write.parquet(dir)
    Seq((2L, "beta", 0.5)).toDF("id", "name", "score")
      .write.mode("append").parquet(dir)

    val df = Compactor.readEvolved(spark, dir)
    assert(df.columns.sorted.toSeq == Seq("id", "name", "score"))
    assert(df.count() == 2)
    assert(df.filter(col("id") === 1 && col("score").isNull).count() == 1)
    assert(df.filter(col("id") === 2 && col("score") === 0.5).count() == 1)
  }
}

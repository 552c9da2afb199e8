package graft

import graft.operators.Incremental
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkTestBase {

  test("merged state+delta equals the full-scan aggregate") {
    val li = Tables.lineitem(spark, sfDir)
    val merged = Incremental.incrementalAgg(spark, sfDir)
      .select("l_partkey", "n_items", "sum_qty", "revenue", "last_shipdate")
    val full = Incremental.aggState(li)
      .select(
        col("l_partkey"), col("n_items"),
        round(col("sum_qty"), 4).as("sum_qty"),
        round(col("revenue"), 4).as("revenue"),
        col("last_shipdate"))
      .orderBy("l_partkey")
    assert(merged.collect().toSeq == full.collect().toSeq)
  }

  test("provenance flags: every row drew from at least one side, both sides occur") {
    val m = Incremental.incrementalAgg(spark, sfDir).cache()
    assert(m.filter(!col("had_history") && !col("had_delta")).count() == 0)
    // the cutover actually splits the data (otherwise the merge is vacuous)
    assert(m.filter(col("had_history")).count() > 0)
    assert(m.filter(col("had_delta")).count() > 0)
    assert(m.filter(col("had_history") && col("had_delta")).count() > 0)
    m.unpersist()
  }

  test("merge with an empty delta is the identity on state") {
    val li = Tables.lineitem(spark, sfDir)
    val state = Incremental.aggState(li)
    val empty = Incremental.aggState(li.filter(lit(false)))
    val merged = Incremental.mergeAggState(state, empty)
    assert(merged.filter(col("had_delta")).count() == 0)
    assert(merged.count() == state.count())
    val diff = merged.select("l_partkey", "n_items", "sum_qty", "revenue")
      .exceptAll(state.select("l_partkey", "n_items", "sum_qty", "revenue"))
    assert(diff.count() == 0)
  }
}

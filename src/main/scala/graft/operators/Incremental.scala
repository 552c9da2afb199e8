package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view pattern
  * every production ETL converges on: a stored per-key aggregate STATE
  * is advanced by merging a (small) daily DELTA, never by rescanning
  * history. At 100 TB the full-scan rebuild is hours of cluster time
  * daily; the merge touches |delta| + |affected state| rows, and when
  * the state table is bucketed on the key (sources/Bucketing.scala)
  * the merge join is exchange-free on the state side.
  *
  * Only MERGEABLE aggregates live in the state (sum/count/min/max —
  * here n_items, sum_qty, revenue); derived values (averages) are
  * computed at read time from the merged sums, which is what makes the
  * increment exact rather than approximate.
  *
  * The reference's pipeline re-derives its catalog aggregates from
  * scratch each run (batch_processor.py recomputes per-batch stats);
  * this is the shape that survives when "each run" means 100 TB.
  */
object Incremental {

  /** Mergeable per-part aggregate of one lineitem slice. */
  def aggState(slice: DataFrame): DataFrame =
    slice.groupBy(col("l_partkey"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        max(col("l_shipdate")).as("last_shipdate"))

  /** Advance `state` by `delta`: full-outer join on the key, each
    * mergeable aggregate combined with coalesce-to-identity. Exactly
    * the rows present in either side survive; provenance flags record
    * which sides contributed.
    */
  def mergeAggState(state: DataFrame, delta: DataFrame): DataFrame = {
    val s = state.select(
      col("l_partkey"), col("n_items").as("s_n"), col("sum_qty").as("s_q"),
      col("revenue").as("s_r"), col("last_shipdate").as("s_d"))
    val d = delta.select(
      col("l_partkey").as("d_key"), col("n_items").as("d_n"),
      col("sum_qty").as("d_q"), col("revenue").as("d_r"),
      col("last_shipdate").as("d_d"))
    s.join(d, col("l_partkey") === col("d_key"), "full_outer")
      .select(
        coalesce(col("l_partkey"), col("d_key")).as("l_partkey"),
        (coalesce(col("s_n"), lit(0L)) + coalesce(col("d_n"), lit(0L))).as("n_items"),
        (coalesce(col("s_q"), lit(0.0)) + coalesce(col("d_q"), lit(0.0))).as("sum_qty"),
        (coalesce(col("s_r"), lit(0.0)) + coalesce(col("d_r"), lit(0.0))).as("revenue"),
        greatest(col("s_d"), col("d_d")).as("last_shipdate"),
        col("s_n").isNotNull.as("had_history"),
        col("d_n").isNotNull.as("had_delta"))
  }

  /** The oracle-checked query: state = everything shipped before the
    * cutover, delta = at-or-after; the MERGED aggregate must equal the
    * full-scan aggregate bit-for-bit on the mergeable columns (sums and
    * counts are associative — that equality is the correctness claim of
    * incremental maintenance). In production the state side is the
    * stored table; here both slices come from the same scan so the
    * oracle can replay the full aggregate.
    */
  private val Cutover = "1997-01-01"

  def incrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val state = aggState(li.filter(col("l_shipdate") < lit(Cutover)))
    val delta = aggState(li.filter(col("l_shipdate") >= lit(Cutover)))
    mergeAggState(state, delta)
      .select(
        col("l_partkey"), col("n_items"),
        round(col("sum_qty"), 4).as("sum_qty"),
        round(col("revenue"), 4).as("revenue"),
        col("last_shipdate"), col("had_history"), col("had_delta"))
      .orderBy(col("l_partkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_incremental_agg" -> (incrementalAgg _))

  val oracles: Map[String, String] = Map(
    // the full-scan aggregate IS the oracle: merged state+delta must
    // reproduce it exactly (plus the provenance flags, recomputed)
    "etl_incremental_agg" ->
      s"""SELECT l_partkey,
         |  count(*) AS n_items,
         |  round(sum(l_quantity), 4) AS sum_qty,
         |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
         |  max(l_shipdate) AS last_shipdate,
         |  bool_or(l_shipdate < DATE '$Cutover') AS had_history,
         |  bool_or(l_shipdate >= DATE '$Cutover') AS had_delta
         |FROM lineitem
         |GROUP BY l_partkey
         |ORDER BY l_partkey""".stripMargin)
}

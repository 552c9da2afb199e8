package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Schedule-allocation and catalog-export operators — the engine-side
  * halves of the reference's two remaining orchestration surfaces:
  *
  *  - `smart_image_processing_schedule` (repository/repo.py:68-140):
  *    every 25 minutes, allocate products pending image processing into
  *    per-business bounded job batches, cap the batch count at the free
  *    concurrency slots, and emit one RunRequest per batch with an
  *    idempotent zero-padded run key (`{schedule_run_id}_job_{NN}`) and
  *    a product-count tag. Dagster dedups repeated run keys, so a
  *    re-evaluated schedule must regenerate the SAME keys — which is
  *    why every step here is deterministic.
  *
  *  - `get_products_by_business` (templatecreation/apiclient.py:609-713):
  *    per-business active-product retrieval in `limit`-sized pages,
  *    stopping when a page comes back short. The reference walks OFFSET
  *    pages; the engine-side analogue is KEYSET pagination — each page
  *    is `key > cursor ORDER BY key LIMIT n`, a pushed-down predicate +
  *    top-k, never a global sort, never a skip-scan.
  */
object EtlScheduling {

  /** Products per allocated job batch (the bounded RunRequest config). */
  private[operators] val JobBatch = 25L

  /** Concurrency cap: max_concurrent_jobs (10) with zero running —
    * repo.py:86 computes `available_slots` the same way.
    */
  private[operators] val AvailableSlots = 10

  /** Deterministic stand-in for `img_schedule_{timestamp}`: run keys
    * must be reproducible across engines and re-evaluations.
    */
  private[operators] val ScheduleRunId = "img_schedule_0"

  /** Pending = no image yet — the complement of [[EtlEnrichment
    * .imageEnrich]]'s deterministic found-set, so "what the schedule
    * feeds" and "what the image stage stubs" agree on one predicate.
    */
  private def pendingProducts(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_partkey") % 3 === 0)
      .select(col("p_partkey"), col("p_brand").as("business"))

  /** Schedule allocation (repo.py:96-130): pending products chunk into
    * per-business `JobBatch`-sized batches; the first `AvailableSlots`
    * batches in (business, batch) order become jobs, each product row
    * carrying its job number, its position inside the job, the job's
    * product-count tag, and the idempotent run key. Per-business
    * numbering is the two-phase [[CorpusOps.keyedCumsum]] (size 1 =
    * rank), so allocation parallelism scales with the catalog, not
    * with the business count; the ONLY global window runs over the
    * aggregated batch relation, which the slot cap then bounds to
    * `AvailableSlots` rows of output.
    */
  def jobAllocation(spark: SparkSession, dir: String): DataFrame = {
    val ranked = CorpusOps.keyedCumsum(
        pendingProducts(spark, dir).withColumn("one", lit(1L)),
        key = "business", order = Seq(col("p_partkey")),
        sizeCol = "one", out = "rank")
      .withColumn("batch_idx", floor((col("rank") - 1) / JobBatch))
    val jobs = ranked
      .groupBy(col("business"), col("batch_idx"))
      .agg(count(lit(1)).as("product_count"))
      .withColumn("job_number",
        row_number().over(Window.orderBy(col("business"), col("batch_idx"))).cast("int"))
      .filter(col("job_number") <= AvailableSlots)
    ranked.join(broadcast(jobs), Seq("business", "batch_idx"))
      .select(
        col("p_partkey"), col("business"), col("job_number"),
        concat(lit(s"${ScheduleRunId}_job_"),
          lpad(col("job_number").cast("string"), 2, "0")).as("run_key"),
        pmod(col("rank") - 1, lit(JobBatch)).as("pos_in_job"),
        col("product_count"))
      .orderBy(col("p_partkey"))
  }

  /** Page size for the catalog export (apiclient.py `limit`). */
  private[operators] val PageLimit = 25L

  /** Active-status stand-in (the reference's `status=true` filter). */
  private def activeProducts(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_partkey") % 10 =!= 0)
      .select(col("p_partkey"), col("p_brand").as("business"))

  /** One keyset page — the building block a paging client calls in a
    * loop (apiclient.py:652-697 does this with OFFSET pages): strictly
    * after `afterKey`, at most `limit` rows, ordered by key. Plans as a
    * pushed-down range predicate on the scan + TakeOrderedAndProject —
    * page cost is O(limit), independent of how deep into the catalog
    * the cursor sits, where OFFSET pagination re-scans and re-sorts
    * everything before the page. Spec-pinned (SchedulingSpec).
    */
  def productsAfter(spark: SparkSession, dir: String, business: String,
      afterKey: Long, limit: Int): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_brand") === business && col("p_partkey") % 10 =!= 0 &&
        col("p_partkey") > afterKey)
      .select(col("p_partkey"), col("p_brand").as("business"))
      .orderBy(col("p_partkey"))
      .limit(limit)

  /** The full export ledger: every business's active products cut into
    * `PageLimit`-sized keyset pages — per page its row count, key
    * range, the cursor that fetches it (`last_key` of the previous
    * page; null = start), and the client's stop condition
    * (`is_final`, reference: "len(products) < limit" / no more pages).
    * Ranks come from the two-phase [[CorpusOps.keyedCumsum]]; the
    * per-business windows for cursor/is_final run over the PAGE
    * relation, 1/`PageLimit` the size of the catalog.
    */
  def productsPage(spark: SparkSession, dir: String): DataFrame = {
    val ranked = CorpusOps.keyedCumsum(
        activeProducts(spark, dir).withColumn("one", lit(1L)),
        key = "business", order = Seq(col("p_partkey")),
        sizeCol = "one", out = "rank")
      .withColumn("page", floor((col("rank") - 1) / PageLimit).cast("int"))
    val w = Window.partitionBy(col("business")).orderBy(col("page"))
    ranked
      .groupBy(col("business"), col("page"))
      .agg(count(lit(1)).as("n_products"),
        min(col("p_partkey")).as("first_key"),
        max(col("p_partkey")).as("last_key"))
      .withColumn("cursor", lag(col("last_key"), 1).over(w))
      .withColumn("is_final", lead(col("page"), 1).over(w).isNull)
      .orderBy(col("business"), col("page"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_job_allocation" -> (jobAllocation _),
    "etl_products_page"  -> (productsPage _))

  val oracles: Map[String, String] = Map(
    "etl_job_allocation" ->
      s"""WITH pending AS (
         |  SELECT p_partkey, p_brand AS business FROM part WHERE p_partkey % 3 = 0),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY business ORDER BY p_partkey) AS rn
         |  FROM pending),
         |batches AS (
         |  SELECT business, (rn - 1) // $JobBatch AS batch_idx, count(*) AS product_count
         |  FROM ranked GROUP BY 1, 2),
         |jobs AS (
         |  SELECT * FROM (
         |    SELECT *, CAST(row_number() OVER (ORDER BY business, batch_idx) AS INT) AS job_number
         |    FROM batches)
         |  WHERE job_number <= $AvailableSlots)
         |SELECT r.p_partkey, r.business, j.job_number,
         |  '${ScheduleRunId}_job_' || lpad(CAST(j.job_number AS VARCHAR), 2, '0') AS run_key,
         |  CAST((r.rn - 1) % $JobBatch AS BIGINT) AS pos_in_job,
         |  j.product_count
         |FROM ranked r
         |JOIN jobs j ON r.business = j.business AND (r.rn - 1) // $JobBatch = j.batch_idx
         |ORDER BY r.p_partkey""".stripMargin,
    "etl_products_page" ->
      s"""WITH active AS (
         |  SELECT p_partkey, p_brand AS business FROM part WHERE p_partkey % 10 <> 0),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY business ORDER BY p_partkey) AS rn
         |  FROM active),
         |pages AS (
         |  SELECT business, CAST((rn - 1) // $PageLimit AS INT) AS page,
         |    count(*) AS n_products,
         |    min(p_partkey) AS first_key, max(p_partkey) AS last_key
         |  FROM ranked GROUP BY 1, 2)
         |SELECT business, page, n_products, first_key, last_key,
         |  lag(last_key) OVER (PARTITION BY business ORDER BY page) AS cursor,
         |  (lead(page) OVER (PARTITION BY business ORDER BY page) IS NULL) AS is_final
         |FROM pages
         |ORDER BY business, page""".stripMargin)
}

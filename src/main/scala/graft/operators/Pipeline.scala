package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's whole catalog-onboarding job as ONE declarative plan
  * (restaurant_menu_pdf_job.py:74-103 end-to-end): clean → dedup →
  * stage-0 precheck anti-join → stage-1 UPC validation/match → stage-3
  * content defaulting for the unmatched → stage-5a ES document build.
  *
  * The reference runs this as row-at-a-time Python over fixed-size
  * batches with per-stage API round-trips; here the whole job is a
  * single Catalyst plan — each stage is a narrow projection or one
  * co-keyed shuffle (dedup window on (name, price); anti-join and UPC
  * join both on the product key), so the end-to-end job is 3 shuffles
  * total regardless of input size, and every stage's filter is pushed
  * into the one parquet scan it reads.
  */
object Pipeline {

  def endToEnd(spark: SparkSession, dir: String): DataFrame = {
    // clean: item validation + defaults + price parse (stage "extract+clean")
    val cleaned = EtlCleaning.queries("etl_menu_clean")(spark, dir)
    // dedup: keep first row per (name, price) — reference keep='first'
    val w = Window.partitionBy(col("name"), col("price")).orderBy(col("p_partkey"))
    val deduped = cleaned.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    // stage 0 precheck: drop products that already exist downstream
    val existing = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("2001-09-01").cast("timestamp"))
      .select(col("l_partkey")).distinct()
    val fresh = deduped.join(existing, col("p_partkey") === col("l_partkey"), "left_anti")
    // stage 1: UPC validation; a valid barcode is an immediate master match
    val upcs = EtlMatching.upcValidate(spark, dir).select(col("p_partkey").as("uk"), col("upc"))
    val staged = fresh.join(upcs, col("p_partkey") === col("uk"), "left")
    // stage 3 + 5a: defaults for the unmatched, then the ES doc shape
    staged.select(
        when(col("upc").isNotNull, concat(lit("m-"), col("p_partkey")))
          .otherwise(concat(lit("r-"), col("p_partkey"))).as("doc_id"),
        col("name").as("product_name"),
        col("category"),
        col("subcategory"),
        col("description"),
        col("price"),
        col("upc"),
        when(col("upc").isNotNull, lit("upc")).otherwise(lit("generated")).as("match_type"),
        lit(true).as("is_active"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_pipeline_e2e" -> (endToEnd _))

  val oracles: Map[String, String] = Map(
    "etl_pipeline_e2e" -> {
      val cleanedSql = EtlCleaning.oracles("etl_menu_clean")
        .replace("ORDER BY p_partkey", "")
      val upcSql = EtlMatching.oracles("etl_upc_validate")
        .replace("ORDER BY p_partkey", "")
      s"""WITH cleaned AS ($cleanedSql),
         |deduped AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY name, price ORDER BY p_partkey) AS rn
         |    FROM cleaned) WHERE rn = 1),
         |fresh AS (
         |  SELECT * FROM deduped d
         |  WHERE NOT EXISTS (SELECT 1 FROM lineitem
         |                    WHERE l_partkey = d.p_partkey
         |                      AND l_shipdate >= TIMESTAMP '2001-09-01')),
         |upcs AS ($upcSql)
         |SELECT
         |  CASE WHEN u.upc IS NOT NULL THEN 'm-' || f.p_partkey
         |       ELSE 'r-' || f.p_partkey END AS doc_id,
         |  f.name AS product_name, f.category, f.subcategory, f.description,
         |  f.price, u.upc,
         |  CASE WHEN u.upc IS NOT NULL THEN 'upc' ELSE 'generated' END AS match_type,
         |  true AS is_active
         |FROM fresh f LEFT JOIN upcs u ON f.p_partkey = u.p_partkey
         |ORDER BY doc_id""".stripMargin
    })
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** File-format readers mirroring the reference's ingest surface
  * (`repository/ops/extraction.py`: CSV via pandas.read_csv, JSON-blob
  * via json.loads, MDB via mdb-export → CSV). All readers take explicit
  * schemas — at 100 TB, schema inference is a full extra pass over the
  * data, so it is never used here. Malformed rows are captured in a
  * `_corrupt` column instead of failing the job (PERMISSIVE), matching
  * the reference's row-level error tolerance.
  */
object Readers {

  /** The reference's menu-item row shape (extraction.py:41-66):
    * price stays a raw string at ingest — cleaning owns the parse.
    */
  val menuItemSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("category", StringType),
    StructField("subcategory", StringType),
    StructField("description", StringType),
    StructField("price", StringType),
    StructField("_corrupt", StringType)))

  /** Grocery-article shape (extraction.py CSV path / data2batches
    * column mapping input).
    */
  val articleSchema: StructType = StructType(Seq(
    StructField("article_id", StringType),
    StructField("name", StringType),
    StructField("brand", StringType),
    StructField("upc", StringType),
    StructField("price", StringType),
    StructField("qte_main", DoubleType),
    StructField("_corrupt", StringType)))

  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)

  /** NDJSON (one object per line) — the splittable layout; a single
    * giant JSON array cannot be read in parallel.
    */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  def menuCsv(spark: SparkSession, path: String): DataFrame =
    csv(spark, path, menuItemSchema)

  def articlesJson(spark: SparkSession, path: String): DataFrame =
    jsonLines(spark, path, articleSchema)
}

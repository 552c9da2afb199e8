package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Elasticsearch bulk-format sink, file-based: each document becomes the
  * standard two NDJSON lines (`{"index": {"_index": …, "_id": …}}` then
  * the source doc), written as partitioned text — the exact payload the
  * reference POSTs to `_bulk` (batch_processor.py:1213-1269,
  * `build_es_documents` + `bulk_index_documents`), minus the HTTP hop.
  *
  * Writing happens executor-side and partition-parallel: no driver
  * collect, each task streams its partition straight to its own file,
  * so the sink scales with the cluster like any other writer.
  */
object EsBulkSink {

  /** One `line` column holding the action line + the doc line. The
    * action line goes through to_json too (never string concatenation):
    * an `_id` containing a quote or backslash must be escaped or the
    * NDJSON is malformed. The source doc keeps explicit nulls
    * (ignoreNullFields=false) to match the reference's bulk payload,
    * which carries every field.
    */
  def bulkLines(docs: DataFrame, index: String, idCol: String): DataFrame = {
    val fields = docs.columns.filter(_ != idCol)
    val action = to_json(struct(
      struct(lit(index).as("_index"), col(idCol).cast("string").as("_id")).as("index")),
      // keep a null _id visible ({"_id":null}) instead of silently
      // dropping the field — ES would auto-assign an id and the bad
      // row would never surface
      Map("ignoreNullFields" -> "false"))
    val source = to_json(struct(fields.toIndexedSeq.map(col): _*),
      Map("ignoreNullFields" -> "false"))
    docs.select(concat(action, lit("\n"), source).as("line"))
  }

  /** Write bulk NDJSON under `path`, one file per partition. */
  def write(docs: DataFrame, index: String, idCol: String, path: String): Unit =
    bulkLines(docs, index, idCol).write.mode("overwrite").text(path)

  // --- bulk-response accounting ---------------------------------------
  // The reference checks each _bulk response's per-item status and
  // retries/reports failures (api/api-client.py:211-268). The HTTP hop
  // is external; the data-processing part a Spark engine owns is
  // response-item parsing and the per-batch error/retry bookkeeping.

  /** The `items[]` element of an ES bulk response, explicit schema. */
  val bulkItemSchema: StructType = StructType(Seq(
    StructField("index", StructType(Seq(
      StructField("_id", StringType),
      StructField("status", IntegerType),
      StructField("error", StructType(Seq(
        StructField("type", StringType),
        StructField("reason", StringType)))))))))

  /** Parse one bulk-response item JSON per row into (_id, status,
    * error_type, is_ok, is_retryable). 429/503 are the retryable
    * statuses (queue-full / unavailable); 4xx mapping errors are
    * permanent. Per-row from_json with an explicit schema — map-only,
    * codegen'd, no shuffle.
    */
  def parseBulkResponseItems(items: DataFrame, lineCol: String): DataFrame =
    items
      .withColumn("it", from_json(col(lineCol), bulkItemSchema).getField("index"))
      .withColumn("_id", col("it._id"))
      .withColumn("status", col("it.status"))
      .withColumn("error_type", col("it.error.type"))
      .withColumn("is_ok", col("status").between(200, 299))
      .withColumn("is_retryable", col("status").isin(429, 503))
      .drop("it", lineCol)

  /** Per-batch accounting: docs indexed / failed / retryable — the
    * numbers the reference logs per bulk call. One shuffle on batch id.
    */
  def bulkAccounting(items: DataFrame, batchCol: String, lineCol: String): DataFrame =
    parseBulkResponseItems(items, lineCol)
      .groupBy(col(batchCol))
      .agg(
        count(lit(1)).as("n_items"),
        sum(when(col("is_ok"), 1L).otherwise(0L)).as("n_ok"),
        sum(when(!col("is_ok") && !col("is_retryable"), 1L).otherwise(0L)).as("n_permanent"),
        sum(when(col("is_retryable"), 1L).otherwise(0L)).as("n_retryable"))

  /** The retry queue: ids whose items failed with a retryable status —
    * join back to the doc source to rebuild the next bulk payload.
    */
  def retryQueue(items: DataFrame, lineCol: String): DataFrame =
    parseBulkResponseItems(items, lineCol)
      .filter(col("is_retryable"))
      .select(col("_id"))
}

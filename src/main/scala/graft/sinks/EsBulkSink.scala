package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
      struct(lit(index).as("_index"), col(idCol).cast("string").as("_id")).as("index")))
    val source = to_json(struct(fields.toIndexedSeq.map(col): _*),
      Map("ignoreNullFields" -> "false"))
    docs.select(concat(action, lit("\n"), source).as("line"))
  }

  /** Write bulk NDJSON under `path`, one file per partition. */
  def write(docs: DataFrame, index: String, idCol: String, path: String): Unit =
    bulkLines(docs, index, idCol).write.mode("overwrite").text(path)
}

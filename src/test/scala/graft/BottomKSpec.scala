package graft

import graft.operators.CorpusOps
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The native bounded bottom-k aggregate (TypedImperativeAggregate
  * tier): correctness against the window formulation, and the plan
  * shape that justifies it — partial aggregation BEFORE the exchange,
  * no whole-corpus window sort.
  */
class BottomKSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  test("bottom_k_by_key equals the row_number window formulation") {
    val agg = CorpusOps.corpusSampleBottomK(spark, sfDir)
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val windowed = Tables.documents(spark, sfDir)
      .withColumn("sample_rank", row_number().over(w).cast("int"))
      .filter(col("sample_rank") <= 10)
      .select("lang", "sample_rank", "doc_id")
      .orderBy("lang", "sample_rank")
    assert(agg.collect().toSeq == windowed.collect().toSeq)
  }

  test("plan: ObjectHashAggregate with a partial mode pass, no window, no full sort") {
    val df = Tables.documents(spark, sfDir)
      .groupBy(col("lang"))
      .agg(call_function("bottom_k_by_key",
        md5(col("doc_id").cast("string")), col("doc_id"), lit(10)).as("sample"))
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan
    val aggs = collect(plan) { case a: ObjectHashAggregateExec => a }
    assert(aggs.size == 2, s"expected partial+final ObjectHashAggregate in:\n$plan")
    assert(aggs.exists(_.aggregateExpressions.exists(_.mode.toString == "Partial")),
      "no partial-mode aggregate before the exchange")
    val windows = collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.isEmpty)
  }

  test("SQL surface: callable from spark.sql, deterministic across partitionings") {
    Tables.documents(spark, sfDir).createOrReplaceTempView("docs_bk")
    val viaSql = spark.sql(
      """SELECT lang, bottom_k_by_key(md5(CAST(doc_id AS STRING)), doc_id, 10) AS s
        |FROM docs_bk GROUP BY lang""".stripMargin)
      .select(col("lang"), col("s")).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val repartitioned = Tables.documents(spark, sfDir).repartition(13)
    repartitioned.createOrReplaceTempView("docs_bk13")
    val viaSql13 = spark.sql(
      """SELECT lang, bottom_k_by_key(md5(CAST(doc_id AS STRING)), doc_id, 10) AS s
        |FROM docs_bk13 GROUP BY lang""".stripMargin)
      .select(col("lang"), col("s")).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql == viaSql13, "sample membership changed with partitioning")
  }

  test("SQL builder: clear arity error, foldable k accepted, bad k rejected") {
    import spark.implicits._
    Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "v").createOrReplaceTempView("bk_args")
    // wrong arity → usable message, not IndexOutOfBoundsException
    val arityErr = intercept[Exception] {
      spark.sql("SELECT g, bottom_k_by_key(md5(CAST(v AS STRING)), v) FROM bk_args GROUP BY g")
        .collect()
    }
    assert(arityErr.getMessage.contains("expects 3 arguments"), arityErr.getMessage)
    // k as a LONG literal and as a foldable cast both work
    Seq("10L", "CAST(10 AS INT)", "5 + 5").foreach { kExpr =>
      val out = spark.sql(
        s"SELECT g, bottom_k_by_key(md5(CAST(v AS STRING)), v, $kExpr) AS s FROM bk_args GROUP BY g")
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(out("a").toSet == Set(1L, 2L), s"k=$kExpr")
    }
    // non-positive and non-integral k rejected with the builder's message
    Seq("0", "'x'", "v").foreach { kExpr =>
      val err = intercept[Exception] {
        spark.sql(
          s"SELECT g, bottom_k_by_key(md5(CAST(v AS STRING)), v, $kExpr) FROM bk_args GROUP BY g")
          .collect()
      }
      assert(err.getMessage.contains("bottom_k_by_key: k must be"), s"k=$kExpr: ${err.getMessage}")
    }
  }

  test("groups smaller than k return all their rows, ordered by key") {
    import spark.implicits._
    val tiny = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "v")
    tiny.createOrReplaceTempView("tiny_bk")
    val out = spark.sql(
      "SELECT g, bottom_k_by_key(md5(CAST(v AS STRING)), v, 10) AS s FROM tiny_bk GROUP BY g")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(out("a").toSet == Set(1L, 2L) && out("b") == Seq(3L))
  }
}

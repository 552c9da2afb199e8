package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL-text surface of the engine: the same tables exposed as temp
  * views and queried via `spark.sql(...)` — for users who drive the
  * library from SQL rather than the DataFrame API. The text goes
  * through the identical Catalyst pipeline (same pushdown, same AQE,
  * same injected rules), so nothing here is a second implementation;
  * `sql_upc_valid_share` additionally exercises the session-registered
  * native `upc_valid` function from SQL.
  */
object SqlSurface {

  private def withViews[A](spark: SparkSession, dir: String)(f: => A): A = {
    Tables.names.foreach { n =>
      // events needs its typed accessor (nanos→micros timestamp surface)
      val df = if (n == "events") Tables.events(spark, dir) else Tables.load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
    f
  }

  /** Revenue per nation, pure SQL text (same shape as q5 without the
    * region filter).
    */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame =
    withViews(spark, dir) {
      spark.sql(
        """SELECT n_name,
          |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
          |  count(*) AS n_items
          |FROM lineitem
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN nation ON s_nationkey = n_nationkey
          |GROUP BY n_name
          |ORDER BY n_name""".stripMargin)
    }

  /** Share of synthesized article codes passing the NATIVE upc_valid
    * expression, called from SQL (GraftExtensions must be installed).
    */
  def upcValidShare(spark: SparkSession, dir: String): DataFrame =
    withViews(spark, dir) {
      spark.sql(
        """SELECT p_brand,
          |  count(*) AS n_parts,
          |  sum(CASE WHEN upc_valid(lpad(CAST(p_partkey * 777371 % 1000000000000 AS STRING), 12, '0'))
          |           THEN 1 ELSE 0 END) AS n_valid
          |FROM part
          |GROUP BY p_brand
          |ORDER BY p_brand""".stripMargin)
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_revenue_by_nation" -> (revenueByNation _),
    "sql_upc_valid_share"   -> (upcValidShare _))

  val oracles: Map[String, String] = Map(
    "sql_revenue_by_nation" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "sql_upc_valid_share" -> {
      // DuckDB re-implements the check digit in plain SQL
      def d(i: Int) = s"CAST(substr(code, $i, 1) AS INT)"
      val odd  = Seq(1, 3, 5, 7, 9, 11).map(d).mkString(" + ")
      val even = Seq(2, 4, 6, 8, 10).map(d).mkString(" + ")
      s"""WITH coded AS (
         |  SELECT p_brand,
         |    lpad(CAST(p_partkey * 777371 % 1000000000000 AS VARCHAR), 12, '0') AS code
         |  FROM part)
         |SELECT p_brand, count(*) AS n_parts,
         |  CAST(sum(CASE WHEN (3 * ($odd) + ($even) + ${d(12)}) % 10 = 0
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_valid
         |FROM coded GROUP BY p_brand ORDER BY p_brand""".stripMargin
    })
}

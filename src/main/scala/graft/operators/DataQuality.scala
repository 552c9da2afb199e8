package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking — the validation layer
  * a production catalog pipeline runs before publishing (the
  * reference's scattered per-row checks — non-null names, price
  * parses, UPC validity, batch_processor.py:406-430 +
  * extract_menu_with_gemini_op.py:154-180 — consolidated into one
  * audited report). Five constraint kinds:
  *
  *  - completeness: fraction of non-null values in a column
  *  - uniqueness: no duplicate keys
  *  - referential integrity: foreign keys resolve against a dimension
  *  - range: numeric values inside declared bounds
  *  - accepted values: categorical column within its domain
  *
  * Every check is an AGGREGATE over one scan of its table — the report
  * over N constraints on a table costs one pass, not N. At 100 TB each
  * aggregation is map-side partial; nothing here shuffles more than
  * (#constraints) rows. The referential check is the only join: a
  * left-anti against the (bounded) dimension keyset.
  */
object DataQuality {

  /** One constraint result row. */
  private def result(name: String, target: String,
      nViolations: Column, nRows: Column): Column =
    struct(
      lit(name).as("constraint_name"), lit(target).as("target"),
      nViolations.cast("long").as("n_violations"),
      nRows.cast("long").as("n_rows"),
      (nViolations === 0).as("pass"))

  /** The audit report: one row per declared constraint, with violation
    * counts and pass flags; `ORDER BY constraint_name` for stability.
    */
  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
    val li = Tables.lineitem(spark, dir)

    // one pass over part: three constraints from one aggregation
    val partChecks = part.agg(
      result("part_name_complete", "part.p_name",
        sum(when(col("p_name").isNull, 1).otherwise(0)), count(lit(1))).as("c1"),
      result("part_price_range", "part.p_retailprice",
        sum(when(col("p_retailprice") < 0 || col("p_retailprice") > 100000, 1)
          .otherwise(0)), count(lit(1))).as("c2"),
      result("part_key_unique", "part.p_partkey",
        count(lit(1)) - countDistinct(col("p_partkey")), count(lit(1))).as("c3"))
      .select(explode(array(col("c1"), col("c2"), col("c3"))).as("r"))

    // one pass over lineitem: two value constraints
    val liChecks = li.agg(
      result("lineitem_qty_range", "lineitem.l_quantity",
        sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1).otherwise(0)),
        count(lit(1))).as("c1"),
      result("lineitem_returnflag_domain", "lineitem.l_returnflag",
        sum(when(col("l_returnflag").isin("A", "N", "R"), 0).otherwise(1)),
        count(lit(1))).as("c2"))
      .select(explode(array(col("c1"), col("c2"))).as("r"))

    // referential integrity: every l_partkey resolves in part
    val refChecks = li.select(col("l_partkey"))
      .join(part.select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_anti")
      .agg(result("lineitem_partkey_resolves", "lineitem.l_partkey -> part",
        count(lit(1)), lit(null).cast("long")).as("r"))
      .select(col("r"))

    partChecks.unionByName(liChecks).unionByName(refChecks)
      .select(col("r.constraint_name"), col("r.target"),
        col("r.n_violations"), col("r.n_rows"), col("r.pass"))
      .orderBy(col("constraint_name"))
  }

  /** Statistical DRIFT report between two snapshots of the same table
    * — the monitoring companion to [[dqChecks]] (static constraints)
    * and [[EtlCleaning.snapshotDiff]] (row-level changes): per metric,
    * the old value, new value, and delta, in long format so adding a
    * metric adds a row, not a schema change. Each side is ONE
    * aggregation pass collapsed to a single row; the join of the two
    * 1-row frames is trivially broadcast — drift over 100 TB snapshots
    * costs two scans and moves ~10 numbers. Averages are rounded
    * in-query (both engines agree) and counts are cast to double so
    * one typed value column carries every metric.
    */
  def dqSnapshotDrift(spark: SparkSession, dir: String): DataFrame = {
    def stats(df: DataFrame, key: String, price: String): DataFrame =
      df.agg(
        count(lit(1)).cast("double").as("n_rows"),
        countDistinct(col(key)).cast("double").as("n_keys"),
        round(avg(col(price)), 6).as("avg_price"),
        round(min(col(price)), 6).as("min_price"),
        round(max(col(price)), 6).as("max_price"))
    val o = stats(EtlCleaning.oldSnapshot(spark, dir), "old_key", "old_price")
    val n = stats(EtlCleaning.newSnapshot(spark, dir), "new_key", "new_price")
    val metrics = Seq("n_rows", "n_keys", "avg_price", "min_price", "max_price")
    val long = metrics.map { m =>
      struct(lit(m).as("metric"), col(m).as("old_value"), col(s"${m}_new").as("new_value"))
    }
    o.crossJoin(broadcast(n.select(metrics.map(m => col(m).as(s"${m}_new")): _*)))
      .select(explode(array(long: _*)).as("r"))
      .select(col("r.metric"), col("r.old_value"), col("r.new_value"))
      .withColumn("delta", round(col("new_value") - col("old_value"), 6))
      .orderBy(col("metric"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_checks" -> (dqChecks _),
    "dq_snapshot_drift" -> (dqSnapshotDrift _))

  val oracles: Map[String, String] = Map(
    "dq_snapshot_drift" ->
      """WITH old AS (
        |  SELECT p_partkey AS k, p_retailprice AS p
        |  FROM part WHERE p_partkey % 89 <> 0),
        |new AS (
        |  SELECT p_partkey AS k,
        |    CASE WHEN p_partkey % 10 = 3 THEN round(p_retailprice * 1.1, 2)
        |         ELSE p_retailprice END AS p
        |  FROM part WHERE p_partkey % 97 <> 0),
        |os AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_rows,
        |    CAST(count(DISTINCT k) AS DOUBLE) AS n_keys,
        |    round(avg(p), 6) AS avg_price,
        |    round(min(p), 6) AS min_price, round(max(p), 6) AS max_price
        |  FROM old),
        |ns AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_rows,
        |    CAST(count(DISTINCT k) AS DOUBLE) AS n_keys,
        |    round(avg(p), 6) AS avg_price,
        |    round(min(p), 6) AS min_price, round(max(p), 6) AS max_price
        |  FROM new),
        |long AS (
        |  SELECT 'n_rows' AS metric, os.n_rows AS old_value, ns.n_rows AS new_value FROM os, ns
        |  UNION ALL SELECT 'n_keys', os.n_keys, ns.n_keys FROM os, ns
        |  UNION ALL SELECT 'avg_price', os.avg_price, ns.avg_price FROM os, ns
        |  UNION ALL SELECT 'min_price', os.min_price, ns.min_price FROM os, ns
        |  UNION ALL SELECT 'max_price', os.max_price, ns.max_price FROM os, ns)
        |SELECT metric, old_value, new_value,
        |  round(new_value - old_value, 6) AS delta
        |FROM long ORDER BY metric""".stripMargin,
    "dq_checks" ->
      """WITH part_checks AS (
        |  SELECT * FROM (
        |    SELECT 'part_name_complete' AS constraint_name, 'part.p_name' AS target,
        |      CAST(sum(CASE WHEN p_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
        |      count(*) AS n_rows FROM part
        |    UNION ALL
        |    SELECT 'part_price_range', 'part.p_retailprice',
        |      CAST(sum(CASE WHEN p_retailprice < 0 OR p_retailprice > 100000 THEN 1 ELSE 0 END) AS BIGINT),
        |      count(*) FROM part
        |    UNION ALL
        |    SELECT 'part_key_unique', 'part.p_partkey',
        |      count(*) - count(DISTINCT p_partkey), count(*) FROM part)),
        |li_checks AS (
        |  SELECT * FROM (
        |    SELECT 'lineitem_qty_range' AS constraint_name, 'lineitem.l_quantity' AS target,
        |      CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
        |      count(*) AS n_rows FROM lineitem
        |    UNION ALL
        |    SELECT 'lineitem_returnflag_domain', 'lineitem.l_returnflag',
        |      CAST(sum(CASE WHEN l_returnflag IN ('A', 'N', 'R') THEN 0 ELSE 1 END) AS BIGINT),
        |      count(*) FROM lineitem)),
        |ref_checks AS (
        |  SELECT 'lineitem_partkey_resolves' AS constraint_name,
        |    'lineitem.l_partkey -> part' AS target,
        |    (SELECT count(*) FROM lineitem l
        |     WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        |      AS n_violations,
        |    CAST(NULL AS BIGINT) AS n_rows)
        |SELECT constraint_name, target, n_violations, n_rows,
        |  (n_violations = 0) AS pass
        |FROM (SELECT * FROM part_checks UNION ALL
        |      SELECT * FROM li_checks UNION ALL
        |      SELECT * FROM ref_checks)
        |ORDER BY constraint_name""".stripMargin)
}

package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cleaning / normalization operators from the reference's extract +
  * batch-splitting layer, re-expressed as declarative Spark plans.
  *
  * The reference works on menu / grocery-article rows; here `part`
  * plays the product-catalog role. Missing values are synthesized with
  * deterministic modular predicates so the cleaning branches are
  * actually exercised (the driver's tables have no nulls).
  *
  * Reference: repository/ops/extraction.py:93-95 (fillna),
  * repository/ops/restaurant_menu_pdf_v1/extract_menu_with_gemini_op.py:154-180
  * (validate_and_clean_items), repository/ops/data2batches.py:41-77
  * (column mapping + batching).
  */
object EtlCleaning {

  /** `QteMain` NaN→0 fill (extraction.py:93-95). Nulls synthesized on a
    * modular predicate, then coalesced — the fill itself is the operator.
    */
  def fillnaZero(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_quantity") > 40, lit(null)).otherwise(col("l_quantity")).as("quantity_raw"))
      .withColumn("quantity", coalesce(col("quantity_raw"), lit(0.0)))
      .drop("quantity_raw")
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Menu-item validation + defaulting + price parse
    * (extract_menu_with_gemini_op.py:154-180): non-null name, default
    * subcategory 'General', default description 'Delicious {name}',
    * price → strip non-[0-9.] → double.
    */
  def menuClean(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    p.select(
        col("p_partkey"),
        col("p_name").as("name"),
        col("p_type").as("category"),
        when(col("p_size") % 7 === 0, lit(null)).otherwise(col("p_brand")).as("subcategory_raw"),
        when(col("p_size") % 5 === 0, lit(null))
          .otherwise(concat(lit("Tasty "), col("p_name"))).as("description_raw"),
        // price arrives as display text ("$1234.56 USD") — parse it
        concat(lit("$"), col("p_retailprice").cast("string"), lit(" USD")).as("price_text"))
      .filter(col("name").isNotNull)
      .select(
        col("p_partkey"),
        col("name"),
        col("category"),
        coalesce(col("subcategory_raw"), lit("General")).as("subcategory"),
        coalesce(col("description_raw"), concat(lit("Delicious "), col("name"))).as("description"),
        regexp_replace(col("price_text"), "[^0-9.]", "").cast("double").as("price"))
      .orderBy(col("p_partkey"))
  }

  /** Industry-specific column mapping + null/empty-name filter
    * (data2batches.py:41-68, restaurant branch).
    */
  def columnMapRestaurant(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        when(col("p_size") % 11 === 0, lit("")).otherwise(col("p_name")).as("product_name"),
        concat(lit("Tasty "), col("p_name")).as("description"),
        col("p_type").as("category_name"),
        col("p_brand").as("subcategory_name"),
        col("p_retailprice").as("price"))
      .filter(col("product_name").isNotNull && col("product_name") =!= "")
      .orderBy(col("p_partkey"))

  /** Grocery branch of the industry column mapping
    * (data2batches.py:53-62): Article/Description/QteMain/Taxe2/
    * PrixVente → article_id/product_name/quantity/is_tax/price, then
    * the same null/empty-name filter as the restaurant flow.
    */
  def columnMapGrocery(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        lpad((col("l_partkey") * 777371L % 1000000000000L).cast("string"), 12, "0")
          .as("article_id"),
        when(col("l_partkey") % 97 === 0, lit(""))
          .otherwise(concat(lit("Article "), col("l_partkey"))).as("product_name"),
        col("l_quantity").as("quantity"),
        (col("l_tax") > 0).as("is_tax"),
        col("l_extendedprice").as("price"),
        col("l_orderkey"), col("l_linenumber"))
      .filter(col("product_name").isNotNull && col("product_name") =!= "")
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** drop_duplicates(subset=[name, price], keep='first')
    * (extract_menu_with_gemini_op.py:115). "First" = lowest source key;
    * expressed as a window so it stays a single shuffle on the dedup key.
    */
  def dedupFirst(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_name"), col("p_retailprice")).orderBy(col("p_partkey"))
    Tables.part(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .orderBy(col("p_partkey"))
  }

  /** Deterministic fixed-size batch assignment (data2batches.py:74-77).
    *
    * Global row numbers WITHOUT a global window: range-partition on the
    * order key (partitions are then globally ordered), rank locally
    * inside each partition, and add per-partition offsets from the tiny
    * (≤ #partitions rows, broadcast) cumulative count table. The only
    * unpartitioned window in the plan runs over that count table, so no
    * single task ever sees more than one partition of the data — this
    * survives 1000 executors, unlike `Window.orderBy(key)`.
    */
  def batchAssign(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_name"))
      .repartitionByRange(col("p_partkey"))
      .withColumn("pid", spark_partition_id())
    val local = base.withColumn("lrn",
      row_number().over(Window.partitionBy(col("pid")).orderBy(col("p_partkey"))))
    val offsets = local.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
      .withColumn("offset", coalesce(
        sum(col("cnt")).over(Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "offset")
    local.join(broadcast(offsets), "pid")
      .withColumn("rn", col("lrn") + col("offset"))
      .select(
        col("p_partkey"), col("p_name"),
        floor((col("rn") - 1) / 10.0).cast("long").as("batch_id"),
        ((col("rn") - 1) % 10).cast("long").as("pos_in_batch"))
      .orderBy(col("p_partkey"))
  }

  /** MDB catalog ingest stand-in (extraction.py:108-157,
    * `extract_mdb_from_blob`) — the grocery flow's main entry format.
    * The reference shells out `mdb-export … Articles` and parses the
    * resulting CSV; the shell-out is external, and what the engine owns
    * — exercised end-to-end here — is the Articles CSV contract
    * ([[graft.sources.Readers.parseMdbArticleLines]]): RFC-4180 quoted
    * fields with embedded commas, empty field → null, string → typed
    * coercion. Export lines are synthesized deterministically from
    * `part` so the oracle can assert parse(line) equals the direct
    * derivation — a quoting or coercion bug on either side breaks the
    * match.
    */
  def articlesIngest(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Readers
    val price = when(col("p_size") % 5 === 0, lit(""))
      .otherwise(col("p_retailprice").cast("decimal(12,2)").cast("string"))
    val line = concat_ws(",",
      lpad((col("p_partkey") * 777371L % 1000000000000L).cast("string"), 12, "0"),
      concat(lit("\""), col("p_name"), lit(", "), col("p_brand"), lit("\"")),
      price,
      col("p_size").cast("string"),
      (col("p_size") % 2).cast("string"))
    val lines = Tables.part(spark, dir).select(col("p_partkey"), line.as("line"))
    Readers.parseMdbArticleLines(lines, "line")
      .select("p_partkey", "article_id", "product_name", "price", "quantity", "is_tax")
      .orderBy(col("p_partkey"))
  }

  /** Data-quality outlier flagging: per-category price z-scores
    * (population stddev), |z| > 2 flagged. The category stats are one
    * partial-aggregated shuffle over #categories rows, joined back
    * broadcast — the fact side is scanned once and never shuffled.
    */
  def priceOutliers(spark: SparkSession, dir: String): DataFrame = {
    val stats = Tables.part(spark, dir)
      .groupBy(col("p_type").as("cat"))
      .agg(
        avg(col("p_retailprice")).as("mu"),
        stddev_pop(col("p_retailprice")).as("sigma"))
    Tables.part(spark, dir)
      .join(broadcast(stats), col("p_type") === col("cat"))
      .select(
        col("p_partkey"), col("p_type"), col("p_retailprice"),
        round((col("p_retailprice") - col("mu")) / col("sigma"), 6).as("z"))
      .withColumn("is_outlier", abs(col("z")) > 2)
      .orderBy(col("p_partkey"))
  }

  /** Row-level validation with machine-readable reason codes — the
    * quarantine half of the reference's validate-and-clean step
    * (extract_menu_with_gemini_op.py:154-180 silently drops/defaults;
    * a production ETL routes rejects to a quarantine table WITH the
    * reasons, so upstream can fix the source). Dirtiness is synthesized
    * on modular predicates (null names, unparsable price text, negative
    * quantities) so every reason fires; the checks are all scan-level
    * expressions — a map-only pass at any scale. `concat_ws` skips the
    * null branches of the un-fired checks in both engines, so the
    * reason list needs no array filtering.
    */
  def quarantine(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        when(col("p_partkey") % 53 === 0, lit(null)).otherwise(col("p_name")).as("name"),
        when(col("p_size") % 13 === 0, lit("N/A"))
          .otherwise(concat(lit("$"), col("p_retailprice").cast("string"), lit(" USD")))
          .as("price_text"),
        when(col("p_partkey") % 41 === 0, -col("p_size")).otherwise(col("p_size"))
          .cast("long").as("quantity"))
    // strip → guard '' → cast: "N/A" strips to the empty string, which
    // must become NULL (not a cast failure under ANSI)
    val digits = regexp_replace(col("price_text"), "[^0-9.]", "")
    val price = when(digits === "", lit(null).cast("double")).otherwise(digits.cast("double"))
    raw
      .withColumn("price", price)
      .withColumn("reasons", concat_ws(",",
        when(col("name").isNull || trim(col("name")) === "", "missing_name"),
        when(col("price").isNull || col("price") <= 0, "bad_price"),
        when(col("quantity") < 0, "negative_quantity")))
      .withColumn("is_quarantined", col("reasons") =!= "")
      .select("p_partkey", "name", "price", "quantity", "reasons", "is_quarantined")
      .orderBy(col("p_partkey"))
  }

  /** Snapshot diff — the change-detection half of the reference's
    * update flow (api-client fetches current docs, batch_processor
    * decides what to push): given yesterday's and today's catalog
    * snapshots, classify every key as added / removed / changed /
    * unchanged in ONE full outer join on the business key. Both
    * snapshots are derived deterministically from `part` (modular
    * drops on each side simulate churn; a 10%-price bump on
    * `key % 10 = 3` simulates edits) so the classification is
    * oracle-checkable. At 100 TB this is the canonical
    * co-partitionable join: bucket both snapshot tables by the key
    * (sources/Bucketing.scala) and the diff runs with NO shuffle at
    * all; the status column then feeds an `etl_apply_updates`-style
    * merge. Prices compared exactly — both sides carry the same stored
    * doubles, and the bumped side rounds in-query identically in both
    * engines.
    */
  /** The two deterministic snapshot derivations — shared with
    * [[DataQuality.dqSnapshotDrift]] so the diff and the drift report
    * audit the SAME churn.
    */
  private[operators] def oldSnapshot(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_partkey") % 89 =!= 0)
      .select(col("p_partkey").as("old_key"), col("p_retailprice").as("old_price"))

  private[operators] def newSnapshot(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_partkey") % 97 =!= 0)
      .select(col("p_partkey").as("new_key"),
        when(col("p_partkey") % 10 === 3, round(col("p_retailprice") * 1.1, 2))
          .otherwise(col("p_retailprice")).as("new_price"))

  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val old = oldSnapshot(spark, dir)
    val nw = newSnapshot(spark, dir)
    old.join(nw, col("old_key") === col("new_key"), "full_outer")
      .select(
        coalesce(col("old_key"), col("new_key")).as("p_partkey"),
        col("old_price"), col("new_price"),
        when(col("old_key").isNull, lit("added"))
          .when(col("new_key").isNull, lit("removed"))
          .when(col("old_price") =!= col("new_price"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .orderBy(col("p_partkey"))
  }

  /** CHANGE-DATA-CAPTURE apply — materializing a keyed change log
    * (insert / update / DELETE ops with sequence numbers) into final
    * table state, the log-to-table half every CDC ingestion (Debezium →
    * lakehouse MERGE) runs; distinct from [[EtlEnrichment.applyUpdates]]
    * (field patches, no deletes) and the SCD2 history (which KEEPS all
    * versions). Latest-op-wins per key: one rank window ordered by
    * sequence descending — rank ≤ 1 rides WindowGroupLimit, so each
    * task forwards one candidate row per key into the shuffle no
    * matter how long the change history — keys whose final op is a
    * delete drop out entirely; the per-key change count shares the
    * same window pass. The change log derives deterministically from
    * orders (key = customer, seq = order key, op by modular rule) so
    * both engines replay the identical log.
    */
  def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    val ch = Tables.orders(spark, dir).select(
      col("o_custkey").as("key"),
      col("o_orderkey").as("seq"),
      when(col("o_orderkey") % 10 === 0, "D")
        .when(col("o_orderkey") % 10 <= 3, "U")
        .otherwise("I").as("op"),
      col("o_totalprice").as("value"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("seq").desc)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("key"))
    ch
      .withColumn("rn", row_number().over(w))
      .withColumn("n_changes", count(lit(1)).over(wAll))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select(col("key"), col("op").as("last_op"),
        round(col("value"), 2).as("value"), col("n_changes"))
      .orderBy(col("key"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_cdc_apply"              -> (cdcApply _),
    "etl_snapshot_diff"          -> (snapshotDiff _),
    "etl_quarantine"             -> (quarantine _),
    "etl_price_outliers"         -> (priceOutliers _),
    "etl_fillna_zero"            -> (fillnaZero _),
    "etl_menu_clean"             -> (menuClean _),
    "etl_column_map_restaurant"  -> (columnMapRestaurant _),
    "etl_column_map_grocery"     -> (columnMapGrocery _),
    "etl_dedup_first"            -> (dedupFirst _),
    "etl_batch_assign"           -> (batchAssign _),
    "etl_articles_ingest"        -> (articlesIngest _))

  val oracles: Map[String, String] = Map(
    "etl_cdc_apply" ->
      """WITH ch AS (
        |  SELECT o_custkey AS key, o_orderkey AS seq,
        |    CASE WHEN o_orderkey % 10 = 0 THEN 'D'
        |         WHEN o_orderkey % 10 <= 3 THEN 'U'
        |         ELSE 'I' END AS op,
        |    o_totalprice AS value
        |  FROM orders),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn,
        |    count(*) OVER (PARTITION BY key) AS n_changes
        |  FROM ch)
        |SELECT key, op AS last_op, round(value, 2) AS value, n_changes
        |FROM ranked WHERE rn = 1 AND op <> 'D'
        |ORDER BY key""".stripMargin,
    "etl_snapshot_diff" ->
      """WITH old AS (
        |  SELECT p_partkey AS old_key, p_retailprice AS old_price
        |  FROM part WHERE p_partkey % 89 <> 0),
        |new AS (
        |  SELECT p_partkey AS new_key,
        |    CASE WHEN p_partkey % 10 = 3 THEN round(p_retailprice * 1.1, 2)
        |         ELSE p_retailprice END AS new_price
        |  FROM part WHERE p_partkey % 97 <> 0)
        |SELECT coalesce(old_key, new_key) AS p_partkey, old_price, new_price,
        |  CASE WHEN old_key IS NULL THEN 'added'
        |       WHEN new_key IS NULL THEN 'removed'
        |       WHEN old_price <> new_price THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM old FULL OUTER JOIN new ON old_key = new_key
        |ORDER BY p_partkey""".stripMargin,
    "etl_quarantine" ->
      """WITH raw AS (
        |  SELECT p_partkey,
        |    CASE WHEN p_partkey % 53 = 0 THEN NULL ELSE p_name END AS name,
        |    regexp_replace(
        |      CASE WHEN p_size % 13 = 0 THEN 'N/A'
        |           ELSE '$' || CAST(p_retailprice AS VARCHAR) || ' USD' END,
        |      '[^0-9.]', '', 'g') AS digits,
        |    CAST(CASE WHEN p_partkey % 41 = 0 THEN -p_size ELSE p_size END AS BIGINT) AS quantity
        |  FROM part),
        |p AS (
        |  SELECT p_partkey, name, quantity,
        |    CASE WHEN digits = '' THEN NULL ELSE CAST(digits AS DOUBLE) END AS price
        |  FROM raw),
        |r AS (
        |  SELECT *, concat_ws(',',
        |    CASE WHEN name IS NULL OR trim(name) = '' THEN 'missing_name' END,
        |    CASE WHEN price IS NULL OR price <= 0 THEN 'bad_price' END,
        |    CASE WHEN quantity < 0 THEN 'negative_quantity' END) AS reasons
        |  FROM p)
        |SELECT p_partkey, name, price, quantity, reasons, reasons <> '' AS is_quarantined
        |FROM r ORDER BY p_partkey""".stripMargin,
    "etl_price_outliers" ->
      """WITH stats AS (
        |  SELECT p_type AS cat, avg(p_retailprice) AS mu,
        |    stddev_pop(p_retailprice) AS sigma
        |  FROM part GROUP BY p_type)
        |SELECT p_partkey, p_type, p_retailprice,
        |  round((p_retailprice - mu) / sigma, 6) AS z,
        |  abs(round((p_retailprice - mu) / sigma, 6)) > 2 AS is_outlier
        |FROM part JOIN stats ON p_type = cat
        |ORDER BY p_partkey""".stripMargin,
    "etl_fillna_zero" ->
      """SELECT l_orderkey, l_linenumber,
        |  coalesce(CASE WHEN l_quantity > 40 THEN NULL ELSE l_quantity END, 0.0) AS quantity
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "etl_menu_clean" ->
      """SELECT p_partkey, p_name AS name, p_type AS category,
        |  coalesce(CASE WHEN p_size % 7 = 0 THEN NULL ELSE p_brand END, 'General') AS subcategory,
        |  coalesce(CASE WHEN p_size % 5 = 0 THEN NULL ELSE 'Tasty ' || p_name END,
        |           'Delicious ' || p_name) AS description,
        |  CAST(regexp_replace('$' || CAST(p_retailprice AS VARCHAR) || ' USD', '[^0-9.]', '', 'g') AS DOUBLE) AS price
        |FROM part WHERE p_name IS NOT NULL ORDER BY p_partkey""".stripMargin,
    "etl_column_map_restaurant" ->
      """SELECT p_partkey,
        |  CASE WHEN p_size % 11 = 0 THEN '' ELSE p_name END AS product_name,
        |  'Tasty ' || p_name AS description,
        |  p_type AS category_name, p_brand AS subcategory_name,
        |  p_retailprice AS price
        |FROM part
        |WHERE (CASE WHEN p_size % 11 = 0 THEN '' ELSE p_name END) IS NOT NULL
        |  AND (CASE WHEN p_size % 11 = 0 THEN '' ELSE p_name END) <> ''
        |ORDER BY p_partkey""".stripMargin,
    "etl_column_map_grocery" ->
      """SELECT lpad(CAST(l_partkey * 777371 % 1000000000000 AS VARCHAR), 12, '0') AS article_id,
        |  CASE WHEN l_partkey % 97 = 0 THEN '' ELSE 'Article ' || l_partkey END AS product_name,
        |  l_quantity AS quantity, (l_tax > 0) AS is_tax,
        |  l_extendedprice AS price, l_orderkey, l_linenumber
        |FROM lineitem
        |WHERE (CASE WHEN l_partkey % 97 = 0 THEN '' ELSE 'Article ' || l_partkey END) <> ''
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "etl_dedup_first" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM (
        |  SELECT *, row_number() OVER (PARTITION BY p_name, p_retailprice
        |    ORDER BY p_partkey) AS rn FROM part) t
        |WHERE rn = 1 ORDER BY p_partkey""".stripMargin,
    "etl_batch_assign" ->
      """SELECT p_partkey, p_name,
        |  CAST(floor((rn - 1) / 10.0) AS BIGINT) AS batch_id,
        |  CAST((rn - 1) % 10 AS BIGINT) AS pos_in_batch
        |FROM (SELECT p_partkey, p_name,
        |        row_number() OVER (ORDER BY p_partkey) AS rn FROM part) t
        |ORDER BY p_partkey""".stripMargin,
    // the oracle derives the expected values DIRECTLY (no CSV text):
    // if the Spark-side line synthesis + from_csv parse disagrees with
    // the declared contract in any way, the hashes diverge
    "etl_articles_ingest" ->
      """SELECT p_partkey,
        |  lpad(CAST(p_partkey * 777371 % 1000000000000 AS VARCHAR), 12, '0') AS article_id,
        |  p_name || ', ' || p_brand AS product_name,
        |  CASE WHEN p_size % 5 = 0 THEN NULL
        |       ELSE CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) END AS price,
        |  CAST(p_size AS DOUBLE) AS quantity,
        |  (p_size % 2 = 1) AS is_tax
        |FROM part ORDER BY p_partkey""".stripMargin)
}

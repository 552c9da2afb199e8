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

    val models = modelChecks(
      EtlCleaning.articlesIngest(spark, dir),
      EtlEnrichment.contentDefaults(spark, dir),
      EtlEnrichment.taxSlab(spark, dir))

    partChecks.unionByName(liChecks).unionByName(refChecks).unionByName(models)
      .select(col("r.constraint_name"), col("r.target"),
        col("r.n_violations"), col("r.n_rows"), col("r.pass"))
      .orderBy(col("constraint_name"))
  }

  /** Per-field model-contract rows mirroring the reference's dataclass
    * models (beforeaddingtemplatecreation/models/product_models.py):
    * `MDBProduct` (required name, optional nonnegative price/quantity,
    * 12-digit article id — lines 10-23) over the parsed MDB articles,
    * `ProcessedProduct`/`GeneratedProductContent` (complete name/
    * description/brand/subcategory after defaulting, closed match_type
    * — lines 62-100) over the stage-3 content output, and the
    * `tax_slab` ↔ `is_tax` consistency the tax mapping guarantees.
    * Exposed with injectable relations so the spec can prove each
    * constraint actually fires on violating rows; one aggregation pass
    * per relation, same cost shape as the table checks above.
    */
  private[graft] def modelChecks(articles: DataFrame, content: DataFrame,
      slab: DataFrame): DataFrame = {
    val mdb = articles.agg(
      result("model_mdb_article_id_12_digits", "articles.article_id",
        sum(when(col("article_id").isNull ||
          !col("article_id").rlike("^[0-9]{12}$"), 1).otherwise(0)),
        count(lit(1))).as("c1"),
      result("model_mdb_name_required", "articles.product_name",
        sum(when(col("product_name").isNull ||
          length(trim(col("product_name"))) === 0, 1).otherwise(0)),
        count(lit(1))).as("c2"),
      result("model_mdb_price_nonneg", "articles.price",
        sum(when(col("price") < 0, 1).otherwise(0)), count(lit(1))).as("c3"),
      result("model_mdb_quantity_nonneg", "articles.quantity",
        sum(when(col("quantity") < 0, 1).otherwise(0)), count(lit(1))).as("c4"))
      .select(explode(array(col("c1"), col("c2"), col("c3"), col("c4"))).as("r"))
    val processed = content.agg(
      result("model_content_brand_complete", "content.brand_name",
        sum(when(col("brand_name").isNull ||
          length(col("brand_name")) === 0, 1).otherwise(0)),
        count(lit(1))).as("c1"),
      result("model_content_description_complete", "content.description",
        sum(when(col("description").isNull ||
          length(col("description")) === 0, 1).otherwise(0)),
        count(lit(1))).as("c2"),
      result("model_content_subcategory_complete", "content.subcategory_name",
        sum(when(col("subcategory_name").isNull ||
          length(col("subcategory_name")) === 0, 1).otherwise(0)),
        count(lit(1))).as("c3"),
      result("model_content_match_type_domain", "content.match_type",
        sum(when(col("match_type").isin("mapped", "generated"), 0).otherwise(1)),
        count(lit(1))).as("c4"))
      .select(explode(array(col("c1"), col("c2"), col("c3"), col("c4"))).as("r"))
    val tax = slab.agg(
      result("model_tax_slab_consistent", "tax.tax_slab",
        sum(when(
          (col("is_tax") && col("tax_slab") =!= "TAX_SLAB_TRUE") ||
            (!col("is_tax") && col("tax_slab") =!= "TAX_SLAB_FALSE"), 1)
          .otherwise(0)),
        count(lit(1))).as("r"))
      .select(col("r"))
    mdb.unionByName(processed).unionByName(tax)
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

  /** JOIN-KEY SKEW REPORT — the diagnostic a 100 TB deployment runs
    * BEFORE choosing shuffle strategies: per candidate join key of the
    * fact table, its cardinality, the max/avg rows-per-key ratio, and
    * the share held by the hottest keys. These numbers decide whether
    * a key needs salting (`q_salted_skew_join`'s Salt factor is sized
    * from exactly this max/avg ratio), AQE skew-join thresholds, or
    * nothing. One pass: the fact unpivots to (key_name, key_value) —
    * 3 rows per input row, map-side — then ONE keyed count and one
    * bounded per-key-name top-N window; nothing shuffles more than the
    * per-key count relation.
    */
  def dqSkewReport(spark: SparkSession, dir: String): DataFrame = {
    val TopN = 10
    val perKey = Tables.lineitem(spark, dir)
      .select(expr(
        """stack(3,
          |  'l_partkey',  l_partkey,
          |  'l_suppkey',  l_suppkey,
          |  'l_orderkey', l_orderkey) AS (key_name, key_value)""".stripMargin))
      .groupBy(col("key_name"), col("key_value"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key_name")).orderBy(col("cnt").desc, col("key_value"))
    perKey
      .withColumn("rnk", row_number().over(w))
      .groupBy(col("key_name"))
      .agg(
        sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_per_key"),
        sum(when(col("rnk") <= TopN, col("cnt")).otherwise(0L)).as("topn_rows"))
      .select(
        col("key_name"), col("n_rows"), col("n_keys"), col("max_per_key"),
        round(col("n_rows") / col("n_keys"), 6).as("avg_per_key"),
        // double-cast before the product: Long·Long wraps silently at
        // extreme key cardinalities (the q_basket_lift discipline)
        round(col("max_per_key").cast("double") * col("n_keys").cast("double")
          / col("n_rows").cast("double"), 6).as("skew_ratio"),
        round(col("topn_rows") / col("n_rows"), 6).as("topn_share"))
      .orderBy(col("key_name"))
  }

  /** Bloom geometry for the FPR audit: m bits, k hash functions. */
  private val BloomM = 4096L
  private val BloomK = 3

  /** Bloom-filter FALSE-POSITIVE-RATE audit — the measurement a
    * pipeline runs before trusting any bloom prefilter (the repo uses
    * them for decontamination and runtime join pruning): build a
    * filter over one key population, probe it with KNOWN true
    * negatives, and report the empirical FP rate next to the
    * theoretical (1 − e^(−kn/m))^k bound. The filter here is
    * RELATIONAL — the bit array modeled as the distinct set of set-bit
    * positions (≤ m rows, broadcast), each key hashing to k
    * md5-derived positions — a faithful bloom that BOTH engines
    * compute bit-identically, so unlike the opaque sketch blob the
    * audit itself is oracle-checkable. Inserted: parts shipped in
    * Jan 1996; negatives: all other parts (exact anti-join, so every
    * probe hit is by construction a false positive). Cost shape: two
    * key scans + a broadcast join against the ≤ m-row bit relation.
    */
  def dqBloomFpr(spark: SparkSession, dir: String): DataFrame = {
    // k md5-derived bit positions of the `k_str` column, exploded
    val posCol: Column = explode(expr(
      s"transform(sequence(0, ${BloomK - 1}), j -> " +
        s"pmod(cast(conv(substring(md5(concat(cast(j as string), ':', k_str)), 1, 8), 16, 10) as bigint), ${BloomM}L))"))
    val inserted = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-02-01").cast("timestamp"))
      .select(col("l_partkey")).distinct()
    val bits = inserted
      .select(col("l_partkey").cast("string").as("k_str"))
      .select(posCol.as("pos")).distinct()
      .localCheckpoint() // ≤ m rows; read by every probe
    val negatives = Tables.part(spark, dir).select(col("p_partkey"))
      .join(inserted, col("p_partkey") === col("l_partkey"), "left_anti")
    val probed = negatives
      .select(col("p_partkey"), col("p_partkey").cast("string").as("k_str"))
      .select(col("p_partkey"), posCol.as("pos"))
      .join(broadcast(bits), "pos")
      .groupBy(col("p_partkey")).agg(count(lit(1)).as("hits"))
      .filter(col("hits") === BloomK)
    val nIns = inserted.agg(count(lit(1)).as("n_inserted"))
    val nNeg = negatives.agg(count(lit(1)).as("n_negatives"))
    val nFp = probed.agg(count(lit(1)).as("fp_count"))
    nIns.crossJoin(broadcast(nNeg)).crossJoin(broadcast(nFp))
      .select(
        col("n_inserted"), col("n_negatives"), col("fp_count"),
        round(col("fp_count") / col("n_negatives"), 6).as("fp_rate"),
        round(pow(lit(1.0) - exp(lit(-BloomK.toDouble) * col("n_inserted") / lit(BloomM.toDouble)),
          BloomK.toDouble), 6).as("theo_fpr"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_checks" -> (dqChecks _),
    "dq_skew_report" -> (dqSkewReport _),
    "dq_bloom_fpr" -> (dqBloomFpr _),
    "dq_snapshot_drift" -> (dqSnapshotDrift _))

  val oracles: Map[String, String] = Map(
    "dq_bloom_fpr" ->
      s"""WITH ins AS (
         |  SELECT DISTINCT l_partkey FROM lineitem
         |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-02-01'),
         |bits AS (
         |  SELECT DISTINCT CAST(('0x' || substr(md5(j.j::VARCHAR || ':' || l_partkey::VARCHAR), 1, 8)) AS BIGINT) % $BloomM AS pos
         |  FROM ins, generate_series(0, ${BloomK - 1}) j(j)),
         |neg AS (
         |  SELECT p_partkey FROM part
         |  WHERE p_partkey NOT IN (SELECT l_partkey FROM ins)),
         |probe AS (
         |  SELECT n.p_partkey,
         |    CAST(('0x' || substr(md5(j.j::VARCHAR || ':' || n.p_partkey::VARCHAR), 1, 8)) AS BIGINT) % $BloomM AS pos
         |  FROM neg n, generate_series(0, ${BloomK - 1}) j(j)),
         |fp AS (
         |  SELECT p_partkey FROM probe JOIN bits USING (pos)
         |  GROUP BY p_partkey HAVING count(*) = $BloomK),
         |c AS (SELECT
         |  (SELECT count(*) FROM ins) AS n_inserted,
         |  (SELECT count(*) FROM neg) AS n_negatives,
         |  (SELECT count(*) FROM fp) AS fp_count)
         |SELECT n_inserted, n_negatives, fp_count,
         |  round(fp_count / n_negatives, 6) AS fp_rate,
         |  round(power(1 - exp(-$BloomK.0 * n_inserted / $BloomM.0), $BloomK.0), 6) AS theo_fpr
         |FROM c""".stripMargin,
    "dq_skew_report" ->
      """WITH stacked AS (
        |  SELECT 'l_partkey' AS key_name, l_partkey AS key_value FROM lineitem
        |  UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem
        |  UNION ALL SELECT 'l_orderkey', l_orderkey FROM lineitem),
        |per_key AS (
        |  SELECT key_name, key_value, count(*) AS cnt
        |  FROM stacked GROUP BY 1, 2),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY key_name
        |    ORDER BY cnt DESC, key_value) AS rnk
        |  FROM per_key),
        |agg AS (
        |  SELECT key_name,
        |    CAST(sum(cnt) AS BIGINT) AS n_rows,
        |    count(*) AS n_keys,
        |    max(cnt) AS max_per_key,
        |    CAST(sum(CASE WHEN rnk <= 10 THEN cnt ELSE 0 END) AS BIGINT) AS topn_rows
        |  FROM ranked GROUP BY 1)
        |SELECT key_name, n_rows, n_keys, max_per_key,
        |  round(n_rows / n_keys, 6) AS avg_per_key,
        |  round(CAST(max_per_key AS DOUBLE) * CAST(n_keys AS DOUBLE)
        |    / CAST(n_rows AS DOUBLE), 6) AS skew_ratio,
        |  round(topn_rows / n_rows, 6) AS topn_share
        |FROM agg ORDER BY key_name""".stripMargin,
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
        |    CAST(NULL AS BIGINT) AS n_rows),
        |articles AS (
        |  SELECT lpad(CAST(p_partkey * 777371 % 1000000000000 AS VARCHAR), 12, '0') AS article_id,
        |    p_name || ', ' || p_brand AS product_name,
        |    CASE WHEN p_size % 5 = 0 THEN NULL
        |         ELSE CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) END AS price,
        |    CAST(p_size AS DOUBLE) AS quantity
        |  FROM part),
        |content AS (
        |  SELECT
        |    coalesce(CASE WHEN p_size % 4 = 0 THEN NULL ELSE p_brand END,
        |             CASE WHEN p_size % 2 = 0 THEN 'House Special' ELSE 'Generic' END) AS brand_name,
        |    coalesce(CASE WHEN p_size % 5 = 0 THEN NULL ELSE 'Tasty ' || p_name END, p_name) AS description,
        |    coalesce(CASE WHEN p_size % 7 = 0 THEN NULL ELSE p_brand END,
        |             'miscellaneous items') AS subcategory_name,
        |    CASE WHEN p_size % 4 <> 0 AND p_size % 6 <> 0
        |          AND p_size % 7 <> 0 AND p_size % 5 <> 0
        |         THEN 'mapped' ELSE 'generated' END AS match_type
        |  FROM part),
        |slab AS (
        |  SELECT l_tax > 0.04 AS is_tax,
        |    CASE WHEN l_tax > 0.04 THEN 'TAX_SLAB_TRUE' ELSE 'TAX_SLAB_FALSE' END AS tax_slab
        |  FROM lineitem),
        |model_checks AS (
        |  SELECT * FROM (
        |    SELECT 'model_mdb_article_id_12_digits' AS constraint_name,
        |      'articles.article_id' AS target,
        |      CAST(sum(CASE WHEN article_id IS NULL
        |        OR NOT regexp_matches(article_id, '^[0-9]{12}$') THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
        |      count(*) AS n_rows FROM articles
        |    UNION ALL
        |    SELECT 'model_mdb_name_required', 'articles.product_name',
        |      CAST(sum(CASE WHEN product_name IS NULL
        |        OR length(trim(product_name)) = 0 THEN 1 ELSE 0 END) AS BIGINT),
        |      count(*) FROM articles
        |    UNION ALL
        |    SELECT 'model_mdb_price_nonneg', 'articles.price',
        |      CAST(sum(CASE WHEN price < 0 THEN 1 ELSE 0 END) AS BIGINT),
        |      count(*) FROM articles
        |    UNION ALL
        |    SELECT 'model_mdb_quantity_nonneg', 'articles.quantity',
        |      CAST(sum(CASE WHEN quantity < 0 THEN 1 ELSE 0 END) AS BIGINT),
        |      count(*) FROM articles
        |    UNION ALL
        |    SELECT 'model_content_brand_complete', 'content.brand_name',
        |      CAST(sum(CASE WHEN brand_name IS NULL OR length(brand_name) = 0 THEN 1 ELSE 0 END) AS BIGINT),
        |      count(*) FROM content
        |    UNION ALL
        |    SELECT 'model_content_description_complete', 'content.description',
        |      CAST(sum(CASE WHEN description IS NULL OR length(description) = 0 THEN 1 ELSE 0 END) AS BIGINT),
        |      count(*) FROM content
        |    UNION ALL
        |    SELECT 'model_content_subcategory_complete', 'content.subcategory_name',
        |      CAST(sum(CASE WHEN subcategory_name IS NULL OR length(subcategory_name) = 0 THEN 1 ELSE 0 END) AS BIGINT),
        |      count(*) FROM content
        |    UNION ALL
        |    SELECT 'model_content_match_type_domain', 'content.match_type',
        |      CAST(sum(CASE WHEN match_type IN ('mapped', 'generated') THEN 0 ELSE 1 END) AS BIGINT),
        |      count(*) FROM content
        |    UNION ALL
        |    SELECT 'model_tax_slab_consistent', 'tax.tax_slab',
        |      CAST(sum(CASE WHEN (is_tax AND tax_slab <> 'TAX_SLAB_TRUE')
        |        OR (NOT is_tax AND tax_slab <> 'TAX_SLAB_FALSE') THEN 1 ELSE 0 END) AS BIGINT),
        |      count(*) FROM slab))
        |SELECT constraint_name, target, n_violations, n_rows,
        |  (n_violations = 0) AS pass
        |FROM (SELECT * FROM part_checks UNION ALL
        |      SELECT * FROM li_checks UNION ALL
        |      SELECT * FROM ref_checks UNION ALL
        |      SELECT * FROM model_checks)
        |ORDER BY constraint_name""".stripMargin)
}

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

  /** The banded simhash near-dup pair search, pure SQL text over the
    * SERVED fingerprint artifact (registered as the `simhash_fp` view):
    * band explode via LATERAL VIEW, 16-bit band-key equi-join, native
    * `bit_count` Hamming — the exact query an analyst runs against the
    * maintained fingerprint table, same plan discipline as the Scala
    * form ([[Dedup.dedupSimhashPairs]]; shares its oracle).
    */
  def simhashPairsSql(spark: SparkSession, dir: String): DataFrame = {
    Dedup.servedSimhashFingerprints(spark, dir)
      .createOrReplaceTempView("simhash_fp")
    spark.sql(
      """WITH bands AS (
        |  SELECT doc_id, simhash, band_idx,
        |    shiftright(simhash, 16 * band_idx) & 65535 AS band_bits
        |  FROM simhash_fp
        |  LATERAL VIEW explode(array(0, 1, 2, 3)) b AS band_idx),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.simhash AS fa, b.simhash AS fb
        |  FROM bands a JOIN bands b
        |    ON a.band_idx = b.band_idx AND a.band_bits = b.band_bits
        |    AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, CAST(bit_count(fa ^ fb) AS BIGINT) AS hamming
        |FROM cand WHERE bit_count(fa ^ fb) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin)
  }

  /** Okapi BM25 top-10, pure SQL text over the `documents` view — the
    * inverted-index chain (tf → df/dl → 1-row stats → rarest-term
    * query probe → integer-scaled scoring) written the way a SQL-first
    * analyst would tune it (k1/b live in the text). Same arithmetic
    * order as [[TextAnalysis.textBm25Topk]], whose oracle it shares.
    */
  def bm25TopkSql(spark: SparkSession, dir: String): DataFrame =
    withViews(spark, dir) {
      spark.sql(
        """WITH terms AS (
          |  SELECT doc_id, term
          |  FROM documents
          |  LATERAL VIEW explode(split(lower(trim(text)), '\\s+')) t AS term
          |  WHERE term <> ''),
          |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
          |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
          |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
          |stats AS (SELECT count(*) AS n_docs,
          |            CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
          |qterms AS (SELECT term, df FROM df ORDER BY df ASC, term LIMIT 3),
          |contrib AS (
          |  SELECT tf.doc_id, dl.dl,
          |    ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
          |      * (tf * (1.2 + 1)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) AS c
          |  FROM tf JOIN qterms USING (term) JOIN dl USING (doc_id) CROSS JOIN stats)
          |SELECT doc_id, count(*) AS n_terms_hit, dl,
          |  round(sum(CAST(round(c * 1000000, 0) AS BIGINT)) / 1000000.0, 6) AS score
          |FROM contrib GROUP BY doc_id, dl
          |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)
    }

  /** The quantile-threshold quality gate, pure SQL text: the sigmoid
    * quality score (log-length, stopword, punctuation, uppercase
    * signals), the 25th-percentile cutoff as a 1-row aggregate, and
    * the map-side filter — the relative-threshold recipe in the form
    * an analyst edits. Same arithmetic order as
    * [[TextAnalysis.qualityScore]]; shares
    * [[CorpusOps.corpusQualityGate]]'s oracle.
    */
  def qualityGateSql(spark: SparkSession, dir: String): DataFrame =
    withViews(spark, dir) {
      spark.sql(
        """WITH s AS (
          |  SELECT doc_id,
          |    round(1.0 / (1.0 + exp(-(
          |      ln(CAST(size(split(lower(trim(text)), '\\s+')) AS DOUBLE) + 1) * 0.3
          |      + CAST(size(filter(split(lower(trim(text)), '\\s+'),
          |          x -> array_contains(array('the','a','and','of','to','in','is','it','for','on'), x))) AS DOUBLE)
          |        / CAST(size(split(lower(trim(text)), '\\s+')) AS DOUBLE) * 2.0
          |      - (CAST(length(text) AS DOUBLE) - CAST(length(regexp_replace(text, '[^A-Za-z0-9\\s]', '')) AS DOUBLE))
          |        / CAST(length(text) AS DOUBLE) * 3.0
          |      - (CAST(length(text) AS DOUBLE) - CAST(length(regexp_replace(text, '[A-Z]', '')) AS DOUBLE))
          |        / CAST(length(text) AS DOUBLE) * 2.0))), 6) AS quality_score
          |  FROM documents),
          |t AS (SELECT round(percentile(quality_score, 0.25D), 6) AS p25 FROM s)
          |SELECT doc_id, quality_score, p25 FROM s CROSS JOIN t
          |WHERE quality_score >= p25 ORDER BY doc_id""".stripMargin)
    }

  /** Brute-force cosine top-k from SQL text — the native codegen'd
    * `vec_dot` kernel called as a SQL function (like `upc_valid`
    * above), norms precomputed per vector, broadcast query subset, the
    * windowed rank in the text. Shares [[AnnSearch.annTopk]]'s oracle.
    */
  def annTopkSql(spark: SparkSession, dir: String): DataFrame =
    withViews(spark, dir) {
      spark.sql(
        """WITH n AS (
          |  SELECT vec_id, v, sqrt(vec_dot(v, v)) AS nrm
          |  FROM (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v
          |        FROM embeddings)),
          |scored AS (
          |  SELECT /*+ BROADCAST(q) */ q.vec_id AS q_id, e.vec_id AS vec_id,
          |    round(vec_dot(q.v, e.v) / (q.nrm * e.nrm), 6) AS cosine
          |  FROM n e JOIN (SELECT * FROM n WHERE vec_id % 50 = 0) q
          |    ON e.vec_id <> q.vec_id)
          |SELECT q_id, vec_id AS neighbor_id, cosine, rank
          |FROM (SELECT *, row_number() OVER (
          |        PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
          |      FROM scored)
          |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_revenue_by_nation" -> (revenueByNation _),
    "sql_upc_valid_share"   -> (upcValidShare _),
    "sql_simhash_pairs"     -> (simhashPairsSql _),
    "sql_bm25_topk"         -> (bm25TopkSql _),
    "sql_quality_gate"      -> (qualityGateSql _),
    "sql_ann_topk"          -> (annTopkSql _))

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
    },
    // the SQL-text twins reproduce their operators' results exactly —
    // each reuses the base form's oracle (the served/indexed-twin
    // aliasing convention)
    "sql_simhash_pairs" -> Dedup.oracles("dedup_simhash_pairs"),
    "sql_bm25_topk"     -> TextAnalysis.oracles("text_bm25_topk"),
    "sql_quality_gate"  -> CorpusOps.oracles("corpus_quality_gate"),
    "sql_ann_topk"      -> AnnSearch.oracles("ann_topk"))
}

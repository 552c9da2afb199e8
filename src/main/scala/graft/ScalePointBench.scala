package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Third scale point for the expensive self-contained queries, their
  * served twins, and the artifact builds (round-9 verdict item 5): the
  * driver testdata tops out at sf0.1, so this main synthesizes a 5×
  * corpus ("sf0.5") from it — replica i > 0 keeps its INTERNAL
  * structure intact (the word rehash salts on the replica index only,
  * so within-replica near-dup pairs replicate exactly) while matching
  * nothing across replicas; part prices shift per replica so band
  * occupancy stays realistic; embedding copies nudge one component so
  * distances are non-degenerate. Near-dup pairs, band buckets, and
  * graph nodes all scale linearly by construction — the clean input
  * for a scaling-exponent read.
  *
  * For each query: median-of-3 probe time, plus the FIRST call
  * (build + probe) for served forms — first − median ≈ the one-time
  * artifact build, the build-vs-probe separation the serving tier
  * claims. One JSON line per query.
  */
object ScalePointBench {

  private def j(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)

  /** The measured set: the r9 top-5 expensive queries + served twins +
    * the fixpoint/admission families + the graph artifact content.
    */
  private val targets = Seq(
    "ann_rrf_fusion", "ann_rrf_fusion_served",
    "ann_ivfadc_topk", "ann_ivfadc_served",
    "ann_ivfadc_rerank", "ann_ivfadc_rerank_served",
    "ann_ivfpq_residual",
    "dedup_keep_best", "dedup_keep_best_served",
    "dedup_components", "dedup_components_served",
    "dedup_cluster_stats", "dedup_cluster_stats_served",
    "dedup_components_star",
    "dedup_incremental", "dedup_incremental_served",
    "graph_knn_edges", "graph_pagerank", "graph_pagerank_indexed",
    "multimodal_phash_dct_pairs", "multimodal_phash_dct_pairs_served",
    // r11: the widened-fingerprint pair searches (sub-quadratic
    // candidate growth is the claim under test) and the remaining
    // >20 MB-shuffle queries so every big shuffler has a measured
    // exponent
    "dedup_simhash_pairs", "multimodal_phash_pairs",
    "etl_temporal_join", "etl_scd2_history", "q_price_band_join",
    // r12: the K-capped production twin — output O(n·K), build on the
    // coordinate collapse; must read flat-ish where the unbounded
    // form's 50.8M-pair output is quadratic by contract
    "q_price_band_join_topk",
    // r11: the span extraction's gram self-join is the same
    // quadratic-risk class the fingerprint pair searches are in —
    // the df cap is the bound under test (replica salting keeps each
    // gram's df within its replica, so spans grow linearly by
    // construction and the measured exponent should show it)
    "dedup_exact_spans", "dedup_exact_spans_served",
    // r11: the strip adds a corpus-linear removal explode + keyed
    // strip over the span search; the admission is batch-vs-corpus
    // gram probing (work ∝ new-doc tokens x touched buckets)
    "dedup_span_strip", "dedup_span_admit",
    // r11: the sensitivity trio — each rides its candidate relation,
    // so growth must track the pair search it audits
    "dedup_lsh_sensitivity", "ann_lsh_sensitivity",
    "dedup_simhash_sensitivity")

  /** Versioned done-marker: v2 added lineitem replication (the ETL
    * temporal/scd2 targets); bumping the name forces a one-time
    * rebuild of a dir synthesized by an older round.
    */
  private val SynthMarker = "_SYNTH_DONE_v2"

  private def synthesize(spark: SparkSession, src: String, dst: String,
      replicas: Int): Unit = {
    val fs = new java.io.File(dst)
    if (new java.io.File(fs, SynthMarker).exists()) return
    fs.mkdirs()
    val docs = Tables.documents(spark, src)
    // fixed replica strides require the source ids to fit under them —
    // assert rather than silently alias replicas on a bigger source
    val maxDoc = docs.agg(max(col("doc_id"))).head().getLong(0)
    val maxPart = Tables.part(spark, src)
      .agg(max(col("p_partkey"))).head().getLong(0)
    require(maxDoc < 100000L && maxPart < 1000000L,
      s"replica strides too small (max doc_id $maxDoc, max p_partkey $maxPart)")
    (0 until replicas).map { i =>
      if (i == 0) docs
      else docs.withColumn("doc_id", col("doc_id") + lit(i * 100000L))
        .withColumn("text", concat_ws(" ", expr(
          s"transform(split(text, '\\\\s+'), w -> substr(md5(concat(w, '#$i')), 1, 8))")))
    }.reduce(_ unionByName _)
      .coalesce(4).write.mode("overwrite").parquet(s"$dst/documents.parquet")
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    (0 until replicas).map { i =>
      if (i == 0) emb
      else emb.withColumn("vec_id", col("vec_id") + lit(i * 100000L))
        .withColumn("embedding", expr(
          s"transform(embedding, (x, k) -> CAST(x + IF(k = 0, ${i * 0.0137}, 0.0) AS FLOAT))"))
    }.reduce(_ unionByName _)
      .coalesce(4).write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    val part = Tables.part(spark, src)
    (0 until replicas).map { i =>
      if (i == 0) part
      else part.withColumn("p_partkey", col("p_partkey") + lit(i * 1000000L))
        .withColumn("p_retailprice", col("p_retailprice") + lit(i * 0.013))
    }.reduce(_ unionByName _)
      .coalesce(4).write.mode("overwrite").parquet(s"$dst/part.parquet")
    // lineitem replicates with partkeys shifted IN STEP with part (the
    // temporal join probes part versions by partkey) and orderkeys
    // shifted to stay unique — per-partkey version/window structure
    // replicates exactly, so the scd2/temporal targets grow linearly
    // by construction
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    (0 until replicas).map { i =>
      if (i == 0) li
      else li.withColumn("l_partkey", col("l_partkey") + lit(i * 1000000L))
        .withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L))
    }.reduce(_ unionByName _)
      .coalesce(8).write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
    // the remaining tables pass through 1× (none of the targets scans
    // them, but Tables resolution must not 404)
    Seq("region", "nation", "customer", "supplier", "orders",
      "events").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .coalesce(4).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    new java.io.File(fs, SynthMarker).createNewFile()
  }

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dst = sys.env.getOrElse("SPARK_GRAFT_SYNTH_DIR", "/tmp/graft_sfhalf")
    val replicas = sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "5").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    synthesize(spark, src, dst, replicas)

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dst)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[scale] $name: $e") }
      (System.nanoTime() - t0) / 1e9
    }
    // optional scope for focused re-measures (same contract as Bench's
    // SPARK_GRAFT_BENCH_ONLY); also gates the maintenance measurement
    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY").map(_.r)
    def selected(name: String): Boolean =
      only.forall(_.findFirstIn(name).isDefined)
    val scoped = targets.filter(selected)
    // same fixpoint warmup as Bench so medians are warm-JVM numbers
    if (scoped.nonEmpty)
      Seq("dedup_components", "dedup_cluster_stats", "dedup_incremental")
        .foreach(run)
    scoped.foreach { name =>
      val first = run(name)
      val rest = (1 to 2).map(_ => run(name))
      val med = (first +: rest).sorted.apply(1)
      println(s"""{"query":"$name","first_sec":${j(first)},"median_sec":${j(med)},"replicas":$replicas}""")
    }

    // kNN list MAINTENANCE at scale (not a SparkEntry query — the
    // artifact trickle path): bootstrap the list table over the 5×
    // node relation once, then merge three successive 1000-node
    // batches; the refresh claim is work ∝ batch × distinct
    // coordinates in band reach, so the median batch time must sit
    // far under the bootstrap regardless of corpus replicas.
    if (selected("knn_refresh")) {
      val root = s"$dst/knn_lists_scale"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val nodes0 = graft.operators.GraphOps.partNodes(spark, dst)
        .localCheckpoint()
      val t0 = System.nanoTime()
      graft.operators.IndexMaintenance.bootstrapKnn(spark, root, nodes0)
      val bootSec = (System.nanoTime() - t0) / 1e9
      var base = nodes0
      val times = (1 to 3).map { i =>
        val batch = nodes0.orderBy(col("key")).limit(1000)
          .select((col("key") + lit(i * 100000000L)).as("key"),
            (col("price") + lit(0.004 * i)).as("price"))
          .localCheckpoint()
        val t1 = System.nanoTime()
        graft.operators.IndexMaintenance.refreshKnn(
          spark, root, base, batch, s"scale-batch-$i")
        val dt = (System.nanoTime() - t1) / 1e9
        base = base.unionByName(batch).localCheckpoint()
        dt
      }
      println(s"""{"query":"knn_refresh","bootstrap_sec":${j(bootSec)},"median_sec":${j(times.sorted.apply(1))},"batch_nodes":1000,"replicas":$replicas}""")
    }

    // span-gram MAINTENANCE at scale: bootstrap the gram + df tables
    // over the 5× corpus once, then merge three successive 500-doc
    // batches. The refresh claim is work ∝ batch (its tokenize +
    // explode + df delta), so the median batch time must sit far
    // under the bootstrap's corpus-sized scan.
    if (selected("span_refresh")) {
      val root = s"$dst/span_grams_scale"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val docs0 = Tables.documents(spark, dst)
        .select(col("doc_id"), col("text")).localCheckpoint()
      val t0 = System.nanoTime()
      graft.operators.IndexMaintenance.bootstrapSpans(spark, root, docs0)
      val bootSec = (System.nanoTime() - t0) / 1e9
      val times = (1 to 3).map { i =>
        // fresh doc ids; salted text so batch grams don't all collide
        val batch = docs0.orderBy(col("doc_id")).limit(500)
          .select((col("doc_id") + lit(i * 1000000000L)).as("doc_id"),
            concat_ws(" ", expr(
              s"transform(split(text, '\\\\s+'), w -> substr(md5(concat(w, '@$i')), 1, 8))"))
              .as("text"))
          .localCheckpoint()
        val t1 = System.nanoTime()
        graft.operators.IndexMaintenance.refreshSpans(
          spark, root, batch, s"scale-batch-$i")
        (System.nanoTime() - t1) / 1e9
      }
      println(s"""{"query":"span_refresh","bootstrap_sec":${j(bootSec)},"median_sec":${j(times.sorted.apply(1))},"batch_docs":500,"replicas":$replicas}""")
    }
    spark.stop()
  }
}

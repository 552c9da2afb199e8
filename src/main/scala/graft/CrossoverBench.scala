package graft

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Regime measurement for `dedup_incremental` vs
  * `dedup_incremental_served` (round-9 verdict item 2): the served
  * form exists for corpus ≫ batch, but the per-round bench can only
  * measure batch = 25% of a toy corpus, where the base form's full
  * shingle explode is cheaper than the sliver's constant overhead.
  * This main holds the BATCH FIXED (500 docs) while the corpus grows
  * (1×..8× the sf0.1 documents table, extra replicas word-rehashed so
  * they match nothing), and times
  *
  *  - base: full shingle explode + minhash over corpus ∪ batch, then
  *    the band probe — work ∝ corpus;
  *  - served: the band probe against the PREBUILT signature relation
  *    (built untimed — it is the maintained artifact), shingles
  *    exploded only for candidate-touched docs — work ∝ batch +
  *    candidates.
  *
  * The batch is 500 verbatim copies of corpus docs under fresh ids, so
  * candidate volume stays ~constant as the corpus grows: the served
  * curve should stay ~flat while the base curve grows linearly.
  * Median-of-3 inside one JVM; one JSON line per corpus size. Results
  * land in PLANS.md's round-10 ledger.
  */
object CrossoverBench {

  private def j(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val BatchBase = 90000000L
    // the fixed replica stride only de-aliases when the source ids fit
    // under it — fail loudly rather than silently fold replicas onto
    // each other if SPARK_GRAFT_SF_DIR points at a bigger dataset
    // (sf0.1 max doc_id is 4999; the stride leaves 20x headroom)
    val maxDocId = docs.agg(max(col("doc_id"))).head().getLong(0)
    require(maxDocId < 100000L && maxDocId + 8 * 100000L < BatchBase,
      s"replica stride too small for max doc_id $maxDocId — raise the offsets")
    val batch = docs.filter(col("doc_id") < 500)
      .select((col("doc_id") + BatchBase).as("doc_id"), col("text"))
    val isNew = col("doc_id") >= BatchBase
    // replica i > 0: every word rehashed with the replica index — token
    // counts and sizes stay realistic, cross-replica similarity drops to
    // zero, so extra corpus is WORK for the scan/minhash but not extra
    // candidates (the growing-haystack regime)
    def replica(i: Int): DataFrame =
      if (i == 0) docs
      else docs.select((col("doc_id") + lit(i * 100000L)).as("doc_id"),
        concat_ws(" ", expr(
          s"transform(split(text, '\\\\s+'), w -> substr(md5(concat(w, '#$i#', CAST(doc_id AS STRING))), 1, 8))"))
          .as("text"))

    def median3(f: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }
    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm the fixpoint-free but still JIT-heavy admission path once
    run(Dedup.dedupIncrementalOver(docs.unionByName(batch), isNew))

    for (r <- Seq(1, 2, 4, 8)) {
      val corpus = (0 until r).map(replica).reduce(_ unionByName _)
      val all = corpus.unionByName(batch).localCheckpoint()
      val nCorpus = all.count() - 500
      // the maintained signature table: built once, untimed — serving's
      // whole claim is that ingest keeps it current incrementally
      val sig = Dedup.bandKeysOf(all).localCheckpoint()
      val tBase = median3(run(Dedup.dedupIncrementalOver(all, isNew)))
      val tServed = median3(run(Dedup.dedupIncrementalServedOver(sig, all, isNew)))
      println(s"""{"corpus_docs":$nCorpus,"batch_docs":500,"base_sec":${j(tBase)},"served_sec":${j(tServed)}}""")
    }
    spark.stop()
  }
}

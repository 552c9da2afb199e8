package graft
import org.apache.spark.sql.SparkSession
object Bench {

  private def j(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)

  /** The fixed headline subset printed on the summary line. */
  val headline: Seq[String] = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "q_price_band_join", "q_salted_skew_join", "etl_pipeline_e2e",
    "etl_similarity_match", "etl_scd2_history", "etl_column_map_grocery",
    "dedup_exact", "dedup_minhash", "dedup_ngram_jaccard",
    "dedup_components", "dedup_keep_best", "ann_topk", "ann_lsh_topk",
    "ann_ivf_topk", "text_quality", "text_tfidf_topk", "corpus_curate_e2e",
    "events_sessionize", "events_sliding_volume", "multimodal_frames",
    "sketch_hll_union")

  /** Complete per-query medians — written to BENCH_FULL.json. When
    * per-query shuffle [read, write] byte deltas are supplied they ride
    * along as `shuffle_bytes`: wall-time medians miss row-inflation
    * regressions that warmup noise can mask, byte counts don't. When a
    * baseline is supplied the per-query byte RATIO rides along too,
    * plus the flagged-movers list [[byteMovers]] computes — the
    * machine form of the "bytes first, wall second" adjudication rule.
    */
  def fullLine(results: Map[String, Double], sfDir: String,
      shuffle: Map[String, (Long, Long)] = Map.empty,
      baseline: Map[String, (Long, Long)] = Map.empty,
      baselineRef: Option[String] = None,
      provenance: String = ""): String = {
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val full = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + j(v) }.mkString("{", ",", "}")
    val sh = if (shuffle.isEmpty) "" else
      ",\"shuffle_bytes\":" + shuffle.toSeq.sortBy(_._1)
        .map { case (k, (r, w)) => s"\"" + k + s"\":[$r,$w]" }.mkString("{", ",", "}")
    val rat = if (shuffle.isEmpty || baseline.isEmpty) "" else
      ",\"byte_ratio\":" + shuffle.toSeq.sortBy(_._1)
        .flatMap { case (k, (r, w)) => baseline.get(k).collect {
          case (br, bw) if br + bw > 0 =>
            s"\"" + k + "\":" + j((r + w).toDouble / (br + bw)) } }
        .mkString("{", ",", "}")
    val mv = if (baseline.isEmpty) "" else
      ",\"byte_movers\":" + byteMovers(shuffle, baseline)
        .map { case (q, ratio, cur, base) =>
          // base == 0 is a DISTINCT condition, not a big ratio: emit
          // null so a genuine mover whose tiny baseline yields a real
          // ratio ≥ ZeroBaseRatio can never alias the sentinel (the
          // "base":0 field alone already disambiguates, but only for
          // readers who know to check it)
          val r = if (base == 0) "null" else j(ratio)
          s"""{"q":"$q","ratio":$r,"bytes":$cur,"base":$base}""" }
        .mkString("[", ",", "]")
    // provenance: which committed artifact the byte gate diffed against
    // — without it the committed trail can't prove the diff wasn't
    // against the run's own bytes (the r11 self-diff gap)
    val ref = if (baseline.isEmpty) "" else
      baselineRef.fold("")(r => s""","baseline_commit":"$r"""")
    s"""{"metric":"total","value":${j(total)},"unit":"sec","n_queries":${results.size},"queries":$full$sh$rat$mv$ref$provenance,"sf":"$sfDir"}"""
  }

  /** 1-minute load average from /proc/loadavg — the ambient-host
    * figure the wall-clock provenance records. NaN when unreadable
    * (non-Linux dev box); the bench must never die on telemetry.
    */
  def loadAvg1m(): Double =
    try new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg")),
      java.nio.charset.StandardCharsets.UTF_8).split("\\s+")(0).toDouble
    catch { case _: Exception => Double.NaN }

  /** Host-load provenance for the detail artifact (VERDICT r14 item
    * 4): the r14 wall story ("~1.3× ambient inflation") rested on a
    * PLANS.md note because the bench recorded nothing about host load
    * — now every BENCH_FULL/BENCH_LAST carries the 1-minute loadavg
    * at start and end, the bench's own worker count, the run
    * timestamp, and a load_ok verdict (ambient load at start ≤
    * threshold). A wall comparison across rounds cites these fields;
    * a gate run with load_ok=false is annotated as contended, not
    * trusted.
    */
  def provenanceFields(loadStart: Double, loadEnd: Double, cpus: Int,
      tsMs: Long, thresh: Double): String = {
    def f(v: Double) = if (v.isNaN) "null" else j(v)
    val ok = !loadStart.isNaN && loadStart <= thresh
    s""","load_start":${f(loadStart)},"load_end":${f(loadEnd)},"bench_cpus":$cpus,"load_thresh":${j(thresh)},"load_ok":$ok,"ts_ms":$tsMs"""
  }

  /** Per-query shuffle-byte regression gate: queries whose total
    * shuffle bytes grew more than `ratio`× over the committed quiet
    * baseline. The byte floor keeps listener jitter on KB-scale
    * queries out of the verdict — a sub-floor query can't shuffle
    * enough for its growth to matter, and the floor is far below any
    * real row-inflation signature (the r10 regressions this automates
    * were 50-100 MB movers). Bytes are deterministic per plan where
    * wall time swings up to 6× with driver-side contention: a flagged
    * mover means the PLAN moved.
    */
  /** Finite ratio sentinel for a query whose baseline shuffled ZERO
    * bytes: PositiveInfinity would serialize as bare `Infinity` inside
    * `byte_movers` and make the detail artifact invalid JSON exactly
    * when a zero-baseline mover fires.
    */
  val ZeroBaseRatio = 9999.0

  def byteMovers(cur: Map[String, (Long, Long)],
      base: Map[String, (Long, Long)],
      ratio: Double = 1.5, floorBytes: Long = 4L << 20): Seq[(String, Double, Long, Long)] =
    cur.toSeq
      .flatMap { case (q, (r, w)) => base.get(q).map { case (br, bw) =>
        val c = r + w; val b = br + bw
        (q, if (b > 0) c.toDouble / b else ZeroBaseRatio, c, b)
      } }
      .filter { case (_, rat, c, b) => math.max(c, b) >= floorBytes && rat > ratio }
      .sortBy(-_._2)

  private def parseShuffleBytes(txt: String): Map[String, (Long, Long)] =
    """"shuffle_bytes":\{([^}]*)\}""".r.findFirstMatchIn(txt)
      .map { m =>
        """"([^"]+)":\[(\d+),(\d+)\]""".r.findAllMatchIn(m.group(1))
          .map(g => g.group(1) -> (g.group(2).toLong, g.group(3).toLong))
          .toMap
      }.getOrElse(Map.empty)

  /** Baseline shuffle bytes from a prior bench artifact (an explicit
    * path, e.g. the SPARK_GRAFT_BENCH_BASELINE override). Format is
    * self-authored, so a two-regex parse is exact; any read/parse
    * failure degrades to "no baseline" — the bench must never die on
    * its own telemetry.
    */
  def loadBaselineBytes(path: String): Map[String, (Long, Long)] =
    try parseShuffleBytes(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Exception => Map.empty }

  /** Baseline from the last COMMITTED quiet artifact: content comes
    * from `git show HEAD:<file>`, NEVER the working-tree file — a
    * quiet refresh copies its own output over the working-tree
    * BENCH_FULL.json, so a path read would diff the run against its
    * own bytes and carry no cross-round signal (the r11 gap: every
    * committed byte_ratio was exactly 1.0). Returns the hash of the
    * last commit touching the file as provenance for the artifact's
    * `baseline_commit` field; degrades to ("none", empty) when git or
    * the file is unavailable.
    */
  def loadCommittedBaseline(repoDir: String,
      file: String = "BENCH_FULL.json"): (String, Map[String, (Long, Long)]) =
    try {
      import scala.sys.process._
      val dir = new java.io.File(repoDir)
      val quiet = ProcessLogger(_ => (), _ => ())
      val commit = Process(Seq("git", "log", "-1", "--format=%H", "--", file), dir)
        .!!(quiet).trim
      val txt = Process(Seq("git", "show", s"HEAD:$file"), dir).!!(quiet)
      (if (commit.nonEmpty) commit else "none", parseShuffleBytes(txt))
    } catch { case _: Exception => ("none", Map.empty) }

  /** The printed summary — MUST stay compact. The driver keeps only the
    * LAST ~2000 chars of bench output, so a full per-query map on the
    * JSON line truncates mid-line and never parses (BENCH_r01..r03 all
    * show "parsed": null). Headline subset + 3-dp values keep the line
    * well under the capture window; BenchLineSpec pins the bound.
    */
  def summaryLine(results: Map[String, Double], sfDir: String,
      nByteMovers: Int = -1): String = {
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val qs = headline.flatMap(k => results.get(k).map(v => s"\"" + k + "\":" + j(v)))
      .mkString("{", ",", "}")
    val mv = if (nByteMovers < 0) "" else s""","byte_movers":$nByteMovers"""
    s"""{"metric":"total","value":${j(total)},"unit":"sec","n_queries":${results.size},"detail":"BENCH_FULL.json","queries":$qs$mv,"sf":"$sfDir"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ambient load BEFORE the bench adds its own: this is the number
    // that says whether the run was quiet (the end figure mostly
    // reflects the bench itself)
    val loadStart = loadAvg1m()
    val tsMs = System.currentTimeMillis()
    val loadThresh = cpus.toInt / 2.0
    if (!loadStart.isNaN && loadStart > loadThresh)
      System.err.println(f"[bench] AMBIENT LOAD $loadStart%.2f > $loadThresh%.2f " +
        "at start — wall totals from this run are contended; trust bytes, not seconds")
    // ERROR, not WARN: the driver parses the bench JSON from the LAST
    // ~2000 chars of combined output, and r4's line was drowned by
    // WindowExec partition warnings flushed after the summary
    // (BENCH_r04.json: "parsed": null, tail all WARN lines). The two
    // remaining unpartitioned windows in the fleet are the guarded
    // above-an-aggregate offset rollups (PlanGuardSpec), so the warning
    // carries no signal here.
    spark.sparkContext.setLogLevel("ERROR")
    // untimed warmup at the smallest SF: JIT + codegen for the shared
    // operator paths (scan/agg/join/window/exchange), so the first timed
    // query isn't charged for session spin-up
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // per-query shuffle accounting: stage-level read/write byte counters
    // drained through a listener; each query's delta is taken around its
    // LAST run (so a served query's one-time artifact build never
    // pollutes its steady-state bytes)
    val shuffleRead = new java.util.concurrent.atomic.AtomicLong(0)
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          done: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = done.stageInfo.taskMetrics
        if (m != null) {
          shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    // listener events are async: read the counters once they've been
    // stable for a couple of polls (bounded at ~1s) — bench detail, not
    // a correctness surface
    def settledCounters(): (Long, Long) = {
      var prev = (shuffleRead.get(), shuffleWrite.get())
      var stable = 0
      var polls = 0
      while (stable < 2 && polls < 30) {
        Thread.sleep(30)
        val cur = (shuffleRead.get(), shuffleWrite.get())
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        polls += 1
      }
      prev
    }
    // median-of-3 inside one JVM: round-1 showed single-shot timings
    // swinging 3-20× with machine contention (28.4s vs a 1.4s quiet
    // re-run for the same plan); the median makes round-over-round
    // comparisons mean something. Plan construction is timed along with
    // execution on every run (eager steps like localCheckpoint belong
    // to the query's cost).
    val runs = 3
    // local iteration aid: regex over query names (driver never sets it)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.r)
    // fixed warmup prelude for the checkpointed-fixpoint class
    // (dedup_components/cluster_stats/incremental and kin): these
    // queries JIT a code path nothing else exercises and historically
    // swing ±60% between a cold and a warm JVM with code unchanged —
    // two rounds of re-measure forensics (PLANS.md r8/r9). Running
    // three representatives untimed makes every recorded median a
    // warm-JVM number. Skipped under BENCH_ONLY scoping (local
    // iteration wants speed and knows what it's measuring).
    if (only.isEmpty) {
      Seq("dedup_components", "dedup_cluster_stats", "dedup_incremental")
        .foreach { n =>
          SparkEntry.queries.get(n).foreach { fn =>
            try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            catch { case e: Throwable => System.err.println(s"[bench] warmup $n: $e") }
          }
        }
    }
    val measured = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.findFirstIn(name).isDefined) }
      .map { case (name, fn) =>
      def timeOnce(): Double = {
        val t0 = System.nanoTime()
        // noop sink: materializes EVERY output column (count() would let
        // Catalyst prune the projections and under-measure the query)
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
        (System.nanoTime() - t0) / 1e9
      }
      val earlier = (1 until runs).map(_ => timeOnce())
      val before = settledCounters()
      val last = timeOnce()
      val after = settledCounters()
      val times = (earlier :+ last).sorted
      name -> (times(runs / 2), (after._1 - before._1, after._2 - before._2))
    }
    val results = measured.map { case (n, (t, _)) => n -> t }
    val shuffle = measured.map { case (n, (_, s)) => n -> s }
    // bytes-first regression gate against the committed quiet baseline:
    // a >1.5x byte mover means the PLAN moved (bytes are deterministic
    // per plan; wall time is not under contention) — fail loudly on
    // stderr and carry the list in the detail artifact
    val (baseRef, baseline) = sys.env.get("SPARK_GRAFT_BENCH_BASELINE") match {
      case Some(p) => (s"file:$p", loadBaselineBytes(p)) // explicit override
      case None    => loadCommittedBaseline("/root/repo")
    }
    val movers = byteMovers(shuffle, baseline)
    movers.foreach { case (q, ratio, cur, base) =>
      System.err.println(
        f"[bench] SHUFFLE-BYTE MOVER $q: ${cur / 1e6}%.1f MB vs baseline ${base / 1e6}%.1f MB (${ratio}%.2fx)")
    }
    // the detail file must never cost us the summary line: if the path
    // is unwritable, warn and still print — a lost detail file is an
    // inconvenience, a lost summary line is a round with zero bench
    // signal. The path is pinned (env-overridable) rather than cwd-
    // relative, so launching from another directory can't silently
    // strand the file where nobody reads it. Default is the UNTRACKED
    // BENCH_LAST.json: the committed quiet artifact (BENCH_FULL.json)
    // is copied from it by hand after a quiet run, so a contended
    // driver-side run can never clobber the quiet numbers the
    // round-over-round comparison rests on (r8 verdict item 6).
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_LAST.json"))
      .toAbsolutePath
    val prov = provenanceFields(loadStart, loadAvg1m(), cpus.toInt,
      tsMs, loadThresh)
    try {
      val fw = new java.io.PrintWriter(outPath.toFile)
      try fw.println(fullLine(results, sfDir, shuffle, baseline, Some(baseRef), prov))
      finally fw.close()
      System.err.println(s"[bench] full per-query medians: $outPath")
    } catch {
      case e: Exception => System.err.println(s"[bench] $outPath not written: $e")
    }
    // stop BEFORE printing: the summary must be the last thing in the
    // output stream — nothing Spark logs during shutdown may follow it
    // into the driver's tail capture
    spark.stop()
    println(summaryLine(results, sfDir,
      if (baseline.isEmpty) -1 else movers.size))
  }
}

package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics in batch form — the oracle-checkable
  * equivalents of the Structured Streaming jobs in
  * `graft.streaming.StreamOps` (the reference's Dagster sensors /
  * triggered jobs, re-expressed as event-time computations).
  *
  * `events_hourly` is a tumbling-window aggregation (one shuffle on the
  * composite group key, map-side partial aggregation). `events_sessionize`
  * is gaps-and-islands sessionization: one shuffle on user_id, then
  * lag + running-sum windows and a same-key aggregation — the batch
  * twin of the streaming `mapGroupsWithState` sessionizer, so the two
  * can be cross-checked (see StreamingSpec).
  */
object Events {

  private[operators] val SessionGapMicros = 30L * 60 * 1000000 // 30 min

  /** Hourly tumbling-window aggregate per event type. */
  def eventsHourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("hour"), col("event_type"))

  /** SLIDING-window volume — 1-hour windows advancing every 15 minutes
    * (the overlapping-window dashboard feed; tumbling and session
    * windows are covered by `events_hourly` / `events_session_window`).
    * Uses Spark's native `window(ts, length, slide)` generator: each
    * event expands to length/slide = 4 window assignments BEFORE the
    * aggregation, so the plan stays one explode + one shuffle with
    * map-side partial aggregation — the same shape the streaming twin
    * has under a watermark. Window bounds are emitted as epoch SECONDS
    * (bigint) so both engines compare integers, not timezone-typed
    * timestamps. At 100 TB the 4× row expansion is the stated cost of
    * sliding windows; widen the slide (or aggregate tumbling 15-min
    * panes and roll 4 panes up, the two-level pattern) when the
    * overlap factor hurts.
    */
  def eventsSlidingVolume(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .select(
        unix_timestamp(col("window.start")).as("window_start_s"),
        unix_timestamp(col("window.end")).as("window_end_s"),
        col("event_type"), col("n_events"), col("sum_value"), col("n_users"))
      .orderBy(col("window_start_s"), col("event_type"))

  /** Sessionization with a 30-minute inactivity gap: session boundaries
    * via lag, session ids via running sum, then per-session rollup.
    */
  def eventsSessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prevTs = lag(col("ts"), 1).over(byUser)
    val isNew = when(
      prevTs.isNull ||
        (unix_micros(col("ts")) - unix_micros(prevTs)) > SessionGapMicros, 1L)
      .otherwise(0L)
    Tables.events(spark, dir)
      .withColumn("new_session", isNew)
      .withColumn("session_idx",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("sum_value"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** The BUILT-IN `session_window` sessionizer as an oracle-checked
    * batch query — the compose-existing-ops tier next to the
    * gaps-and-islands formulation above (both 30-min gap). Checkable
    * columns are (user, start, count, sum): the built-in window's end
    * is last-event + gap by definition, not the last event time.
    * Boundary note: `session_window` starts a new session at
    * diff >= gap where the lag formulation uses strict >; the oracle
    * encodes >= (the built-in's semantics) — the two differ only for
    * microsecond-exact 30-minute gaps.
    */
  def eventsSessionWindow(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamOps.sessionWindows(Tables.events(spark, dir))
      .orderBy(col("user_id"), col("session_start"))

  /** Embedded-JSON extraction (the reference's JSON-blob ingest path,
    * ops/extraction.py json.loads): `props` is parsed with an EXPLICIT
    * schema via from_json — never schema inference, which would cost a
    * full extra pass at 100 TB — then aggregated per event type.
    * Malformed JSON yields nulls, not failures (counted separately).
    */
  def eventsJsonKpis(spark: SparkSession, dir: String): DataFrame = {
    val propsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.IntegerType)))
    Tables.events(spark, dir)
      .withColumn("k", from_json(col("props"), propsSchema).getField("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("k")).as("n_parsed"),
        sum(col("k")).as("sum_k"),
        round(avg(col("k")), 6).as("avg_k"))
      .orderBy(col("event_type"))
  }

  /** As-of join — for every purchase, the most recent click AT OR
    * BEFORE it by the same user. Spark has no native as-of operator;
    * rather than a custom physical plan, this composes existing ones
    * (the preferred tier): tag both sides, union, ONE shuffle on
    * user_id, then a carry-forward window (`max(struct(ts, id))` over
    * preceding rows — lexicographic struct max = latest click so far).
    * Cost is a single sort-within-partition pass, the same shape a
    * dedicated merge-join implementation would have; at 100 TB both
    * sides arrive hash-partitioned by user, nothing is replicated.
    * Clicks order before purchases at equal timestamps (side tag in the
    * sort key), matching ASOF `>=` semantics.
    */
  def eventsAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("side"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("side"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("last_click",
        max(when(col("side") === 0, struct(col("ts").as("c_ts"), col("event_id").as("c_id")))).over(w))
      .filter(col("side") === 1 && col("last_click").isNotNull)
      .select(
        col("event_id").as("purchase_id"),
        col("user_id"),
        col("ts").as("purchase_ts"),
        col("last_click.c_id").as("click_id"),
        col("last_click.c_ts").as("click_ts"),
        round((unix_micros(col("ts")) - unix_micros(col("last_click.c_ts"))) / 1e6, 6)
          .as("gap_s"))
      .orderBy(col("purchase_id"))
  }

  /** The SAME as-of join through the NATIVE operator
    * ([[graft.plans.AsOfJoin]]): custom logical node planned by the
    * injected strategy as a physical merge pass — one hash shuffle per
    * side, sort within partitions, O(1) merge state; no union, no
    * window buffer. Same oracle as `events_asof_join` (DuckDB's native
    * ASOF JOIN), so the two implementation tiers are checked against
    * each other through the driver. Tiebreak `event_id` ascending makes
    * the equal-timestamp winner the max event_id, matching the oracle's
    * click dedup.
    */
  def eventsAsofNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("c_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    graft.plans.AsOfJoin.join(
        purchases, clicks,
        leftKeys = Seq(purchases.col("user_id")), rightKeys = Seq(clicks.col("c_user")),
        leftTime = purchases.col("purchase_ts"), rightTime = clicks.col("c_ts"),
        rightTiebreak = Seq(clicks.col("c_id")))
      .select(
        col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("c_id").as("click_id"), col("c_ts").as("click_ts"),
        round((unix_micros(col("purchase_ts")) - unix_micros(col("c_ts"))) / 1e6, 6)
          .as("gap_s"))
      .orderBy(col("purchase_id"))
  }

  /** Daily event-type pivot: one row per day, one count column per
    * event type. The pivot values are DECLARED (not discovered), so the
    * plan is a single aggregation — no extra distinct-values job, which
    * at 100 TB would be a full pre-pass.
    */
  def eventsDailyPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("day"))

  /** Sketch aggregation: HyperLogLog++ distinct-user estimates checked
    * against the exact count. The raw estimate differs between HLL
    * implementations, so the oracle-checkable output is the
    * engine-agnostic claim both engines can assert: the exact count
    * plus `approx_ok` = (estimate within 5% of exact). DuckDB's
    * approx_count_distinct makes the same claim on its side.
    * At 100 TB the sketch is mergeable map-side state per partition —
    * the exact count is the thing that stops scaling, not the sketch.
    */
  def sketchDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_exact"),
        approx_count_distinct(col("user_id"), 0.02).as("n_approx"))
      .select(
        col("event_type"),
        col("n_exact"),
        (abs(col("n_approx") - col("n_exact")) / col("n_exact") <= 0.05)
          .as("approx_ok"))
      .orderBy(col("event_type"))

  /** Sketch REUSE — the pattern that actually matters at 100 TB: build
    * per-(type, day) HyperLogLog sketches ONCE (Datasketches
    * `hll_sketch_agg`, map-side partial), then answer the per-type
    * distinct-users question by MERGING the stored sketches
    * (`hll_union_agg`) without ever rescanning raw events. A real
    * deployment persists the daily sketch table and serves any
    * date-range distinct count from it. Output is the engine-agnostic
    * claim (exact count + estimate-within-5% boolean), same contract as
    * `sketch_distinct_users`, so DuckDB's different HLL implementation
    * asserts the same invariant.
    */
  def sketchHllUnion(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    // the stored artifact: one sketch per (event_type, day)
    val daily = ev.groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    // merge-only query over the sketch table — no raw-event rescan
    val merged = daily.groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("n_approx"))
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    exact.join(merged, "event_type")
      .select(
        col("event_type"), col("n_exact"),
        (abs(col("n_approx") - col("n_exact")) / col("n_exact") <= 0.05)
          .as("approx_ok"))
      .orderBy(col("event_type"))
  }

  /** Resample-to-grid with forward fill — the time-series gap-filling
    * tier (every dashboard/feature-store hourly series needs it: a
    * quiet hour must carry the last observation, not vanish). Per
    * event type: aggregate to hourly points, generate the COMPLETE
    * hour grid between that type's first and last observation
    * (`sequence` + explode — plan work, no driver loop), left-join the
    * observations onto the grid, and fill gaps with
    * `last(value, ignoreNulls)` over the preceding frame. The window
    * runs over the AGGREGATED relation (#types × #hours rows) after
    * one shuffle on the type key, so fill cost is independent of raw
    * event volume; at calendar-scale grids, range-partition the grid
    * by (type, day) and carry boundary values with broadcast offsets —
    * the `etl_batch_assign` two-phase pattern. The first grid point
    * per type is its first observation, so no leading null survives
    * the fill.
    */
  def eventsResampleFfill(spark: SparkSession, dir: String): DataFrame = {
    val agg = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(round(sum(col("value")), 4).as("sum_value"))
    val grid = agg.groupBy(col("event_type"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("event_type"),
        explode(expr("sequence(h0, h1, INTERVAL 1 HOUR)")).as("h"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, -1)
    grid.join(agg, Seq("event_type", "h"), "left")
      .select(col("event_type"),
        unix_timestamp(col("h")).as("hour_s"),
        col("sum_value").isNull.as("was_gap"),
        coalesce(col("sum_value"),
          last(col("sum_value"), ignoreNulls = true).over(w)).as("filled"))
      .orderBy(col("event_type"), col("hour_s"))
  }

  /** Equi-HEIGHT histogram of event values per type (quartile buckets)
    * — the distribution profile next to the equi-width one
    * (`text_length_hist`): bucket edges are the exact interpolated
    * quartiles (rounded so both engines cut at identical values,
    * the `events_quantiles` parity), computed in a #types-row
    * aggregate and broadcast back onto the stream; each event then
    * lands in a bucket via three comparisons. Two passes over events
    * (edges + counts), both map-side combined; the 100 TB swap-in for
    * the edge pass is `approx_percentile`, same contract as
    * `events_quantiles_approx`. Bucket populations come out ~equal by
    * construction — the point of equi-height bins under skew.
    */
  def eventsEquiheightHist(spark: SparkSession, dir: String): DataFrame =
    equiheightOf(Tables.events(spark, dir).select(col("event_type"), col("value")))

  /** The histogram over any (event_type, value) relation — exposed so
    * specs can drive hand-built distributions at the rounding boundary.
    */
  private[graft] def equiheightOf(ev: DataFrame): DataFrame = {
    val edges = ev.groupBy(col("event_type"))
      .agg(
        // percentile over PRE-ROUNDED values: the interpolation inputs
        // are then bit-identical across engines, so a last-ulp
        // difference cannot flip the rounded edge (ADVICE r4)
        round(expr("percentile(round(value, 6), 0.25)"), 6).as("e1"),
        round(expr("percentile(round(value, 6), 0.5)"), 6).as("e2"),
        round(expr("percentile(round(value, 6), 0.75)"), 6).as("e3"))
    ev.join(broadcast(edges), "event_type")
      .withColumn("bucket",
        when(col("value") <= col("e1"), 0)
          .when(col("value") <= col("e2"), 1)
          .when(col("value") <= col("e3"), 2)
          .otherwise(3).cast("int"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n_events"),
        round(min(col("value")), 6).as("lo"),
        round(max(col("value")), 6).as("hi"))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** Event-type transition statistics — the sequence-model view of the
    * stream (what follows what, per user): consecutive event pairs via
    * `lag` over per-user time order, then transition counts and the
    * row-normalized probability P(next | prev). One shuffle on user_id
    * for the lag window (raw-volume work), then an aggregation whose
    * output is #types² rows — the normalizing window runs over THAT
    * tiny relation, never the stream. Probabilities are rounded so
    * both engines emit identical matrices.
    */
  def eventsMarkovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val perPrev = Window.partitionBy(col("prev_type"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .withColumn("p", round(
        col("n_transitions") / sum(col("n_transitions")).over(perPrev), 6))
      .orderBy(col("prev_type"), col("next_type"))
  }

  /** MATCH_RECOGNIZE-style complex-event pattern detection — the
    * SQL-standard row-pattern feature (Flink CEP / Trino
    * MATCH_RECOGNIZE) re-expressed as relational ops Spark already
    * has: per user, the ordered event-type stream collapses to a
    * symbol string (one grouped aggregation — the only shuffle), and
    * the PATTERN clause becomes a regex over that string, counted with
    * non-overlapping leftmost-match semantics — exactly
    * MATCH_RECOGNIZE's AFTER MATCH SKIP PAST LAST ROW. Patterns:
    * `vc*p` (view, any clicks, purchase — the conversion) and `ee+`
    * (an error burst). Per-user state is the user's own event string,
    * bounded by per-user activity, never by the corpus — the same
    * grouped-state contract as the sessionizers. Symbols are the
    * event-type initials (click/error/purchase/signup/view →
    * c/e/p/s/v).
    */
  def eventsCepPattern(spark: SparkSession, dir: String): DataFrame =
    cepPatternOver(Tables.events(spark, dir))

  /** The pattern matcher over any (user_id, ts, event_id, event_type)
    * relation — exposed so specs can plant hand-built sequences.
    */
  private[graft] def cepPatternOver(events: DataFrame): DataFrame = {
    val ev = struct(col("ts"), col("event_id"),
      substring(col("event_type"), 1, 1).as("sym"))
    events
      .select(col("user_id"), ev.as("e"))
      .groupBy(col("user_id"))
      .agg(array_sort(collect_list(col("e"))).as("es"))
      .select(col("user_id"),
        concat_ws("", expr("transform(es, x -> x.sym)")).as("seq"))
      .select(
        col("user_id"),
        length(col("seq")).cast("long").as("seq_len"),
        regexp_count(col("seq"), lit("vc*p")).cast("long").as("n_conversions"),
        regexp_count(col("seq"), lit("ee+")).cast("long").as("n_error_bursts"))
      .withColumn("converted", col("n_conversions") > 0)
      .orderBy(col("user_id"))
  }

  /** Exponential decay weights for the trailing EMA: β = 3/4 so every
    * power is an exact dyadic-rational double (3^k / 4^k, k < 33 fits
    * the mantissa) with a FINITE decimal expansion — the Scala-side
    * repeated product and the oracle's decimal literals denote the
    * identical IEEE value, so the weighted sums are bit-equal across
    * engines with no pow() library in sight.
    */
  private val EmaBeta = 0.75
  private[graft] val EmaK = 8
  private[graft] val emaWeights: Seq[Double] =
    Seq.iterate(1.0, EmaK)(_ * EmaBeta)

  /** Trailing exponentially-weighted moving average of event values per
    * user — the K-term truncated EMA (weights β^0..β^{K-1} over the
    * last K events, normalized by the weights actually present, so the
    * first rows of a stream are unbiased). The recursive EMA is
    * inherently sequential; truncating at K makes it a fixed set of
    * `lag` reads over one user-partitioned window — one shuffle on
    * user_id, K-row bounded state per key, whole-stage codegen'd
    * arithmetic, and the same fixed-K state contract a streaming
    * `mapGroupsWithState` twin would keep.
    */
  def eventsEma(spark: SparkSession, dir: String): DataFrame =
    emaOver(Tables.events(spark, dir))

  /** The EMA over any (user_id, ts, event_id, value) relation —
    * exposed so the streaming twin's spec can cross-check on shared
    * data.
    */
  private[graft] def emaOver(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    def lagV(k: Int): Column = lag(col("value"), k).over(byUser)
    val num = emaWeights.zipWithIndex
      .map { case (w, k) => coalesce(lagV(k) * lit(w), lit(0.0)) }
      .reduce(_ + _)
    val den = emaWeights.zipWithIndex
      .map { case (w, k) => when(lagV(k).isNotNull, lit(w)).otherwise(lit(0.0)) }
      .reduce(_ + _)
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("ema", round(num / den, 6))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Count-min sketch dimensions: d hash rows × w buckets. Error bound
    * ε ≈ e/w of the total stream count with probability 1 − e^−d.
    */
  private val CmsDepth = 4
  private val CmsWidth = 256

  /** Count-min sketch point queries — the frequency-sketch family next
    * to the cardinality sketches (`sketch_distinct_users` /
    * `sketch_hll_union`): d×w integer counters answer "how many events
    * did user u fire?" for ANY user in O(d), never rescanning the
    * stream. The sketch build is the 100 TB story: one aggregation of
    * the d-way-expanded stream with map-side partial combine, so the
    * shuffle carries at most d×w = 1024 counter rows no matter how
    * many events flow in; cells are additive, so per-partition /
    * per-day sketches merge by summing (same reuse pattern as the HLL
    * table). Estimates are min-over-rows, NEVER below the true count
    * (CMS's one-sided guarantee — asserted as a checked column). All
    * integer arithmetic on md5-derived buckets: both engines compute
    * the identical sketch, so the estimates themselves hash-match.
    */
  def sketchCountMin(spark: SparkSession, dir: String): DataFrame = {
    def bucket(j: Column, key: Column): Column = pmod(
      conv(substring(md5(concat(j, lit(":"), key)), 1, 8), 16, 10).cast("bigint"),
      lit(CmsWidth.toLong))
    val ev = Tables.events(spark, dir).select(col("user_id"))
    val cells = ev
      .withColumn("j", explode(sequence(lit(0), lit(CmsDepth - 1))))
      .withColumn("bucket", bucket(col("j"), col("user_id")))
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val q = ev.filter(col("user_id") % 7 === 0)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
      .withColumn("j", explode(sequence(lit(0), lit(CmsDepth - 1))))
      .withColumn("bucket", bucket(col("j"), col("user_id")))
    q.join(broadcast(cells), Seq("j", "bucket"))
      .groupBy(col("user_id"), col("n_exact"))
      .agg(min(col("cnt")).as("n_est"))
      .select(col("user_id"), col("n_exact"), col("n_est"),
        (col("n_est") >= col("n_exact")).as("never_underestimates"))
      .orderBy(col("user_id"))
  }

  /** Hourly volume anomaly detection: each (type, hour) count scored
    * against the mean/stddev of the last 24 OBSERVED hourly buckets for
    * that type (a ROWS frame over the aggregated relation — hours with
    * zero events have no bucket, so the frame can span more than 24
    * wall-clock hours on sparse types), |z| > 3 flagged — the
    * monitoring query a pipeline owner runs over ingest volumes. The
    * expensive part is the hourly aggregation (one shuffle, map-side
    * partial); the trailing window then runs over the AGGREGATED
    * relation (#types × #hours rows), so the window cost is independent
    * of event volume.
    */
  def eventsHourlyAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val trailing = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(-24, -1)
    hourly
      .withColumn("mu", avg(col("n_events")).over(trailing))
      .withColumn("sigma", stddev_pop(col("n_events")).over(trailing))
      .filter(col("sigma") > 0)
      .select(
        col("hour"), col("event_type"), col("n_events"),
        round(col("mu"), 6).as("mu"),
        round((col("n_events") - col("mu")) / col("sigma"), 6).as("z"))
      .withColumn("is_anomaly", abs(col("z")) > 3)
      .orderBy(col("hour"), col("event_type"))
  }

  /** Ordered funnel per user: click → view → purchase, each stage's
    * first occurrence must follow the previous stage's. One shuffle on
    * user_id (the three stage aggregates fold into a single grouped
    * pass via conditional min), then per-user flags — the classic
    * conversion query without a self-join per stage.
    */
  /** Per-user first-occurrence timestamps of the funnel stages —
    * shared by the reach flags and the time-to-convert percentiles.
    */
  private def funnelPerUser(spark: SparkSession, dir: String): DataFrame = {
    def firstTs(t: String) = min(when(col("event_type") === t, col("ts"))).as(s"first_$t")
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(firstTs("click"), firstTs("view"), firstTs("purchase"))
  }
  private def funnelS1 = col("first_click").isNotNull
  private def funnelS2 = funnelS1 &&
    col("first_view").isNotNull && col("first_view") >= col("first_click")
  private def funnelS3 = funnelS2 &&
    col("first_purchase").isNotNull && col("first_purchase") >= col("first_view")

  def eventsFunnel(spark: SparkSession, dir: String): DataFrame =
    funnelPerUser(spark, dir).select(
        col("user_id"),
        funnelS1.as("reached_click"),
        funnelS2.as("reached_view"),
        funnelS3.as("reached_purchase"))
      .orderBy(col("user_id"))

  /** Funnel TIME-TO-CONVERT — the latency half of funnel analytics
    * (the reach counts say HOW MANY convert; this says HOW FAST): per
    * adjacent stage pair, the converted-user count and the p50/p90 of
    * the first-occurrence time delta. Deltas are exact integer
    * MICROSECONDS (unix_micros difference — the sessionizer's
    * timestamp discipline), percentiled with the same exact
    * interpolated `percentile` ↔ `quantile_cont` pairing
    * `events_quantiles` proved engine-exact, and converted to seconds
    * in one rounded division. Cost: the same one per-user aggregate
    * the funnel runs, then a 2-group percentile.
    */
  def eventsFunnelTtc(spark: SparkSession, dir: String): DataFrame = {
    val pu = funnelPerUser(spark, dir)
    val cv = pu.filter(funnelS2).select(
      lit("click_to_view").as("stage_pair"),
      (unix_micros(col("first_view")) - unix_micros(col("first_click"))).as("d_us"))
    val vp = pu.filter(funnelS3).select(
      lit("view_to_purchase").as("stage_pair"),
      (unix_micros(col("first_purchase")) - unix_micros(col("first_view"))).as("d_us"))
    cv.union(vp)
      .groupBy(col("stage_pair"))
      .agg(count(lit(1)).as("n_converted"),
        round(expr("percentile(d_us, 0.5D)") / 1000000.0, 6).as("p50_s"),
        round(expr("percentile(d_us, 0.9D)") / 1000000.0, 6).as("p90_s"))
      .orderBy(col("stage_pair"))
  }

  /** Day-N cohort retention: users grouped by first-active day, counted
    * distinct on each later active day offset. Two grouped passes
    * (first-day per user, then distinct users per (cohort, offset)) —
    * both shuffles on user-derived keys, no window over the corpus.
    */
  def eventsRetention(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    val cohorts = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    days.join(cohorts, "user_id")
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Cohort LTV curves — the VALUE companion to [[eventsRetention]]'s
    * counts: per signup cohort (a user's first active day) and cohort
    * age 0-7, how much cumulative value the cohort has generated and
    * the per-user average — the lifetime-value ramp growth analytics
    * reads cohort-over-cohort. Same first-touch derivation as
    * retention (one min-aggregate per user riding the user-keyed
    * join); each event value is integer-scaled to a bigint BEFORE the
    * per-(cohort, age) sum — so both the group sum and the running LTV
    * cumsum are order-free exact bigint arithmetic at any data size
    * and partitioning, and the window input is the aggregate, never
    * events.
    */
  def eventsCohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"), col("value"))
    val cohorts = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    val perAge = ev.join(cohorts, "user_id")
      .withColumn("age", datediff(col("day"), col("cohort_day")))
      .filter(col("age") <= 7)
      .groupBy(col("cohort_day"), col("age"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        sum(expr("cast(round(value * 1000000.0, 0) as bigint)")).as("v6"))
    val wCum = Window.partitionBy(col("cohort_day")).orderBy(col("age"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val size = perAge.filter(col("age") === 0)
      .select(col("cohort_day"), col("n_users").as("cohort_size"))
    perAge
      .withColumn("cum_v6", sum(col("v6")).over(wCum))
      .join(size, "cohort_day")
      .select(col("cohort_day"), col("age"), col("n_users"), col("cohort_size"),
        round(col("cum_v6") / 1000000.0, 6).as("cum_value"),
        round(col("cum_v6") / col("cohort_size") / 1000000.0, 6).as("ltv_per_user"))
      .orderBy(col("cohort_day"), col("age"))
  }

  /** Exact interpolated quantiles of event values per type (p50/p90/
    * p99). Exact percentile needs the group's values together — fine
    * for bounded groups; at 100 TB switch to `approx_percentile`
    * (mergeable KLL-style sketch, same call shape).
    */
  def eventsValueQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"))
      .orderBy(col("event_type"))

  /** The 100 TB quantile path actually exercised: `approx_percentile`
    * (mergeable KLL-style sketch, map-side partial) checked against the
    * exact percentiles with the engine-agnostic contract — output is
    * the exact p50 plus within-5% booleans for the approximate p50/p90,
    * so DuckDB's own approx_quantile asserts the same claim despite a
    * different sketch implementation.
    */
  def eventsQuantilesApprox(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5D)"), 6).as("p50_exact"),
        expr("approx_percentile(value, 0.5D, 1000)").as("ap50"),
        expr("percentile(value, 0.9D)").as("ep90"),
        expr("approx_percentile(value, 0.9D, 1000)").as("ap90"))
      .select(
        col("event_type"), col("p50_exact"),
        // relative error against |exact| (signed denominator would make
        // the bound vacuously true for negative percentiles), with an
        // absolute-error fallback so an exact value of 0 doesn't turn
        // the contract unsatisfiable (rel err against 0 is Inf/NaN)
        (abs(col("ap50") - col("p50_exact")) <= 0.05 ||
          abs(col("ap50") - col("p50_exact")) / abs(col("p50_exact")) <= 0.05).as("p50_ok"),
        (abs(col("ap90") - col("ep90")) <= 0.05 ||
          abs(col("ap90") - col("ep90")) / abs(col("ep90")) <= 0.05).as("p90_ok"))
      .orderBy(col("event_type"))

  /** Wide→long reshape of the daily KPI pivot via the NATIVE `unpivot`
    * (melt) operator — the inverse of `events_daily_pivot` and the
    * standard step before feeding wide report tables back into long-form
    * processing. Unpivot is pure plan work (each row expands to one row
    * per measure column, no shuffle beyond the upstream aggregation),
    * and the value columns are DECLARED, mirroring the pivot's declared
    * key list — never a schema-discovery pre-pass.
    */
  def eventsUnpivotDaily(spark: SparkSession, dir: String): DataFrame =
    eventsDailyPivot(spark, dir)
      .unpivot(
        Array(col("day")),
        Array(col("click"), col("view"), col("purchase"), col("signup"), col("error")),
        "event_type", "n_events")
      .orderBy(col("day"), col("event_type"))

  /** Point-in-interval attribution — the generic INTERVAL JOIN tier
    * (as-of joins match the latest point; this matches every point
    * inside an arbitrary window). "Promo windows" are derived from the
    * data (the 5 busiest hours, widened to [hour−30 min, hour+90 min)),
    * then every event landing inside a window is attributed to it.
    *
    * The naive plan is an inequality join (`ts >= start AND ts < end`)
    * — a nested loop at any scale. The scale shape here is TIME-BUCKET
    * equi-join: each interval explodes into the hour buckets it covers
    * (a 2-hour window → 3 buckets, a constant), events carry their own
    * hour bucket, the join key is the bucket, and the exact range
    * predicate filters inside the bucket. One shuffle on the bucket
    * key; cost scales with events-per-bucket × windows-per-bucket,
    * never |events| × |windows|. The 5-window table is broadcast here,
    * but the bucket key is what keeps the plan an equi-join when the
    * interval side is millions of campaign windows at 100 TB.
    * Overlapping windows legitimately attribute the same event to each
    * window they cover. Bounds are emitted as epoch seconds so both
    * engines compare integers.
    */
  def eventsPromoAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("ts"), col("user_id"), col("value"))
    val windows = ev
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("h"))
      .limit(5)
      .select(
        (col("h") - expr("INTERVAL 30 MINUTES")).as("w_start"),
        (col("h") + expr("INTERVAL 90 MINUTES")).as("w_end"))
    val wb = windows.withColumn("hb", explode(expr(
      "sequence(date_trunc('hour', w_start), date_trunc('hour', w_end), INTERVAL 1 HOUR)")))
    ev.withColumn("hb", date_trunc("hour", col("ts")))
      .join(wb, Seq("hb"))
      .filter(col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .groupBy(
        unix_timestamp(col("w_start")).as("w_start_s"),
        unix_timestamp(col("w_end")).as("w_end_s"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 4).as("sum_value"))
      .orderBy(col("w_start_s"))
  }

  /** MULTI-TOUCH (linear) ATTRIBUTION — each purchase's value split
    * EQUALLY across that user's clicks in the preceding 30 minutes,
    * credited back to the click hour: the many-to-many fractional-
    * credit model next to the window attribution
    * ([[eventsPromoAttribution]]) and the single-touch as-of join
    * ([[eventsAsofJoin]], last-touch by construction). Pair search is
    * the time-BUCKET equi-join (user, 30-min bucket) with each click
    * emitted into its own and the following bucket, the purchase
    * probing one — candidates are an equi-join, the exact
    * 0 ≤ Δt < 30 min predicate is a residual filter, never a range
    * scan. Credit discipline: per-pair credit value/k is
    * integer-scaled (round(value·10⁶/k)) BEFORE the per-hour sum, so
    * the hour totals are exact bigints — order-free, engine-exact —
    * and k comes from one purchase-keyed count window over the
    * (bounded) pair relation.
    */
  def eventsAttributionMultitouch(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val HalfHour = 1800L
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("click_id"))
      .withColumn("b", explode(array(
        expr(s"unix_timestamp(c_ts) div $HalfHour"),
        expr(s"unix_timestamp(c_ts) div $HalfHour + 1"))))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withColumn("b", expr(s"unix_timestamp(p_ts) div $HalfHour"))
    val pairs = purchases.join(clicks, Seq("user_id", "b"))
      .filter(col("c_ts") <= col("p_ts") &&
        col("c_ts") > col("p_ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("purchase_id"), col("click_id"), col("c_ts"), col("value"))
      .distinct() // a click may match via both its buckets
    val wK = Window.partitionBy(col("purchase_id"))
    pairs
      .withColumn("k", count(lit(1)).over(wK))
      .withColumn("credit6",
        expr("cast(round(value * 1000000.0 / k, 0) as bigint)"))
      .groupBy(date_trunc("hour", col("c_ts")).as("click_hour"))
      .agg(count(lit(1)).as("n_credits"),
        countDistinct(col("purchase_id")).as("n_purchases"),
        round(sum(col("credit6")) / 1000000.0, 6).as("credited_value"))
      .orderBy(col("click_hour"))
  }

  /** Per-hour TOP-N actives — the trending view (top 3 users by event
    * volume each hour, value totals alongside). The aggregate bounds
    * the window's input to one row per (hour, user); the rank ≤ 3 cut
    * rides WindowGroupLimit, so each task forwards at most N rows per
    * hour into the window exchange — the same partial-top-k shape as
    * every per-key ranking here, cost independent of events per user.
    */
  def eventsWindowedTopk(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 6).as("sum_value"))
    val w = Window.partitionBy(col("hour")).orderBy(col("n_events").desc, col("user_id"))
    counts
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .orderBy(col("hour"), col("rank"))
  }

  /** FORECAST BACKTEST — seasonal-naive (same weekday last week)
    * daily-volume forecasting evaluated against actuals, per event
    * type: MAPE and mean error over every day with a 7-day-old
    * ancestor. This is the evaluation loop behind any capacity / KPI
    * forecast: the t−7 baseline is the standard floor a real model
    * must beat, and the backtest is pure plan work — one daily
    * aggregate, one self-join shifted 7 days (equi-join on
    * (type, day)), one keyed summary. Float discipline: daily counts
    * are integers, each day's absolute-percentage-error is
    * integer-scaled (round(|n−f|·10⁶/n)) BEFORE the order-free sum,
    * and MAPE/bias derive from exact bigints in one rounded division
    * each — engine-exact.
    */
  def eventsForecastEval(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    val fc = daily.select(col("event_type"),
      expr("date_add(day, 7)").as("day"), col("n").as("f"))
    daily.join(fc, Seq("event_type", "day"))
      .withColumn("ape6",
        expr("cast(round(abs(n - f) * 1000000.0 / n, 0) as bigint)"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("ape6")).as("sum_ape6"),
        sum(col("n") - col("f")).as("sum_err"))
      .select(col("event_type"), col("n_days"),
        round(col("sum_ape6") / col("n_days") / 1000000.0, 6).as("mape"),
        round(col("sum_err") / col("n_days"), 6).as("mean_err"))
      .orderBy(col("event_type"))
  }

  /** Sliding-window DISTINCT users — daily actives next to trailing
    * 7-day actives (the DAU/WAU pair), computed EXACTLY: windowed
    * count-distinct is the aggregation windows can't express (distinct
    * doesn't decompose over frames), and the standard exact scale
    * trick is the bounded OFFSET EXPLODE — each distinct (user, day)
    * contributes to the 7 window-ends it falls inside, then one keyed
    * distinct count per window end. Inflation is exactly 7× the
    * (user, day) relation — already collapsed from raw events, so cost
    * scales with actives, not event volume. The approximate path at
    * larger windows is the HLL table (`sketch_hll_union` — mergeable
    * partials, no inflation); this operator is its exact counterpart
    * and the oracle for its error. Only observed days emit (the join
    * back to the daily relation prunes phantom window-ends past the
    * data's edge).
    */
  def eventsUniquesSliding(spark: SparkSession, dir: String): DataFrame = {
    val userDays = Tables.events(spark, dir)
      .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
      .localCheckpoint() // feeds both the daily count and the explode
    val daily = userDays.groupBy(col("day"))
      .agg(count(lit(1)).as("uniques_1d")) // (user, day) already distinct
    val w7 = userDays
      .withColumn("off", explode(sequence(lit(0), lit(6))))
      .select(col("user_id"), expr("date_add(day, off)").as("w_end"))
      .groupBy(col("w_end"))
      .agg(countDistinct(col("user_id")).as("uniques_7d"))
    daily.join(w7, daily("day") === w7("w_end"))
      .select(col("day"), col("uniques_1d"), col("uniques_7d"))
      .orderBy(col("day"))
  }

  /** KMV sample size (error ~ 1/√(k−1) ≈ 18%). */
  private val KmvK = 32

  /** KMV (k-minimum-values / theta) sketch SET OPERATIONS — the third
    * sketch family next to cardinality (HLL) and frequency (count-min),
    * and the one neither of those can provide: distinct-count estimates
    * for UNION, INTERSECTION and DIFFERENCE of sets (HLL unions but
    * cannot intersect or diff). Sets here: the part catalogs shipped in
    * Jan vs Feb 1996 — the month-over-month assortment-churn question
    * (retained / added / dropped actives) every retail pipeline asks.
    *
    * The sketch of a set is its k smallest 60-bit md5 hash values;
    * with θ = the k-th smallest, est |S| = (k−1)·2⁶⁰/θ. Set algebra
    * happens on the SAMPLES (Beyer et al. 2007 / the theta-sketch
    * framework): union's k smallest are a subset of the two samples'
    * union; for intersection/difference restrict both samples to
    * h ≤ θ = min(θ_A, θ_B) — below θ each sample contains ALL of its
    * set's hashes, so membership tests are exact there — and scale the
    * surviving count by 2⁶⁰/θ. Defined for |S| ≥ k (spec-asserted
    * full samples; both months hold 60+ parts at the smallest SF).
    *
    * The scale story is the build: the k-smallest pass runs through
    * the native `bottom_k_by_key` aggregate — map-side PARTIAL keeps
    * ≤ k rows per task, the exchange carries O(k) rows total — and
    * everything after operates on two 1-row arrays (broadcast).
    * Integer hashes + one rounded division per measure: both engines
    * compute the identical sketch AND the identical estimates.
    */
  def sketchKmvSetops(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_partkey"), col("l_shipdate"))
    def sampleOf(lo: String, hi: String, out: String): DataFrame =
      li.filter(col("l_shipdate") >= lit(lo).cast("timestamp") &&
          col("l_shipdate") < lit(hi).cast("timestamp"))
        .select(conv(substring(md5(col("l_partkey").cast("string")), 1, 15), 16, 10)
          .cast("bigint").as("h"))
        .distinct()
        .agg(call_function("bottom_k_by_key",
          lpad(col("h").cast("string"), 19, "0"), col("h"), lit(KmvK)).as(out))
    val P60 = math.pow(2, 60)
    def estOf(cnt: Column, theta: Column): Column =
      round(cnt.cast("double") * lit(P60) / theta.cast("double"), 6)
    val kL = lit(KmvK.toLong)
    sampleOf("1996-01-01", "1996-02-01", "arr_a")
      .crossJoin(sampleOf("1996-02-01", "1996-03-01", "arr_b"))
      .withColumn("arr_u", slice(array_sort(array_union(col("arr_a"), col("arr_b"))), 1, KmvK))
      .withColumn("theta_a", element_at(col("arr_a"), KmvK))
      .withColumn("theta_b", element_at(col("arr_b"), KmvK))
      .withColumn("theta", least(col("theta_a"), col("theta_b")))
      .withColumn("cnt_i", expr(s"size(filter(array_intersect(arr_a, arr_b), x -> x <= theta))").cast("bigint"))
      .withColumn("cnt_d", expr(s"size(filter(arr_a, x -> x <= theta AND NOT array_contains(arr_b, x)))").cast("bigint"))
      .select(explode(array(
        struct(lit("a").as("measure"), kL.as("n_sample"),
          estOf(lit((KmvK - 1).toLong), col("theta_a")).as("est")),
        struct(lit("b").as("measure"), kL.as("n_sample"),
          estOf(lit((KmvK - 1).toLong), col("theta_b")).as("est")),
        struct(lit("union").as("measure"), kL.as("n_sample"),
          estOf(lit((KmvK - 1).toLong), element_at(col("arr_u"), KmvK)).as("est")),
        struct(lit("intersect").as("measure"), col("cnt_i").as("n_sample"),
          estOf(col("cnt_i"), col("theta")).as("est")),
        struct(lit("diff_a_b").as("measure"), col("cnt_d").as("n_sample"),
          estOf(col("cnt_d"), col("theta")).as("est")))).as("r"))
      .select(col("r.measure"), col("r.n_sample"), col("r.est"))
      .orderBy(col("measure"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_kmv_setops" -> (sketchKmvSetops _),
    "events_windowed_topk" -> (eventsWindowedTopk _),
    "events_uniques_sliding" -> (eventsUniquesSliding _),
    "events_forecast_eval" -> (eventsForecastEval _),
    "events_attribution_multitouch" -> (eventsAttributionMultitouch _),
    "events_cohort_ltv" -> (eventsCohortLtv _),
    "events_funnel_ttc" -> (eventsFunnelTtc _),
    "events_promo_attribution" -> (eventsPromoAttribution _),
    "events_unpivot_daily" -> (eventsUnpivotDaily _),
    "events_quantiles_approx" -> (eventsQuantilesApprox _),
    "events_sliding_volume" -> (eventsSlidingVolume _),
    "events_quantiles"    -> (eventsValueQuantiles _),
    "events_daily_pivot"  -> (eventsDailyPivot _),
    "sketch_distinct_users" -> (sketchDistinctUsers _),
    "events_hourly"       -> (eventsHourly _),
    "events_sessionize"   -> (eventsSessionize _),
    "events_session_window" -> (eventsSessionWindow _),
    "events_json_kpis"    -> (eventsJsonKpis _),
    "events_asof_join"    -> (eventsAsofJoin _),
    "events_asof_native"  -> (eventsAsofNative _),
    "sketch_hll_union"    -> (sketchHllUnion _),
    "sketch_count_min"    -> (sketchCountMin _),
    "events_resample_ffill" -> (eventsResampleFfill _),
    "events_markov_transitions" -> (eventsMarkovTransitions _),
    "events_equiheight_hist" -> (eventsEquiheightHist _),
    "events_funnel"       -> (eventsFunnel _),
    "events_retention"    -> (eventsRetention _),
    "events_hourly_anomaly" -> (eventsHourlyAnomaly _),
    "events_cep_pattern"  -> (eventsCepPattern _),
    "events_ema"          -> (eventsEma _))

  val oracles: Map[String, String] = Map(
    "sketch_kmv_setops" ->
      s"""WITH ha AS (
         |  SELECT DISTINCT CAST(('0x' || substr(md5(l_partkey::VARCHAR), 1, 15)) AS BIGINT) AS h
         |  FROM lineitem WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-02-01'),
         |hb AS (
         |  SELECT DISTINCT CAST(('0x' || substr(md5(l_partkey::VARCHAR), 1, 15)) AS BIGINT) AS h
         |  FROM lineitem WHERE l_shipdate >= '1996-02-01' AND l_shipdate < '1996-03-01'),
         |sa AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM ha),
         |sb AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hb),
         |sampa AS (SELECT h FROM sa WHERE rn <= $KmvK),
         |sampb AS (SELECT h FROM sb WHERE rn <= $KmvK),
         |su AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM (
         |  SELECT DISTINCT h FROM (SELECT h FROM sampa UNION ALL SELECT h FROM sampb) z) u),
         |ka AS (SELECT h AS theta FROM sa WHERE rn = $KmvK),
         |kb AS (SELECT h AS theta FROM sb WHERE rn = $KmvK),
         |ku AS (SELECT h AS theta FROM su WHERE rn = $KmvK),
         |th AS (SELECT least((SELECT theta FROM ka), (SELECT theta FROM kb)) AS theta),
         |ci AS (SELECT count(*) AS cnt FROM sampa JOIN sampb USING (h), th
         |       WHERE h <= th.theta),
         |cd AS (SELECT count(*) AS cnt FROM sampa, th
         |       WHERE h <= th.theta AND h NOT IN (SELECT h FROM sampb))
         |SELECT * FROM (
         |  SELECT 'a' AS measure, CAST($KmvK AS BIGINT) AS n_sample,
         |    round(${KmvK - 1}.0 * power(2, 60) / (SELECT theta FROM ka), 6) AS est
         |  UNION ALL SELECT 'b', $KmvK,
         |    round(${KmvK - 1}.0 * power(2, 60) / (SELECT theta FROM kb), 6)
         |  UNION ALL SELECT 'union', $KmvK,
         |    round(${KmvK - 1}.0 * power(2, 60) / (SELECT theta FROM ku), 6)
         |  UNION ALL SELECT 'intersect', (SELECT cnt FROM ci),
         |    round((SELECT cnt FROM ci) * power(2, 60) / (SELECT theta FROM th), 6)
         |  UNION ALL SELECT 'diff_a_b', (SELECT cnt FROM cd),
         |    round((SELECT cnt FROM cd) * power(2, 60) / (SELECT theta FROM th), 6)) m
         |ORDER BY measure""".stripMargin,
    "events_equiheight_hist" ->
      """WITH edges AS (
        |  SELECT event_type,
        |    round(quantile_cont(round(value, 6), 0.25), 6) AS e1,
        |    round(quantile_cont(round(value, 6), 0.5), 6) AS e2,
        |    round(quantile_cont(round(value, 6), 0.75), 6) AS e3
        |  FROM events GROUP BY 1),
        |bucketed AS (
        |  SELECT ev.event_type,
        |    CASE WHEN value <= e1 THEN 0
        |         WHEN value <= e2 THEN 1
        |         WHEN value <= e3 THEN 2
        |         ELSE 3 END AS bucket, value
        |  FROM events ev JOIN edges USING (event_type))
        |SELECT event_type, CAST(bucket AS INT) AS bucket,
        |  count(*) AS n_events,
        |  round(min(value), 6) AS lo, round(max(value), 6) AS hi
        |FROM bucketed GROUP BY 1, 2
        |ORDER BY event_type, bucket""".stripMargin,
    "events_markov_transitions" ->
      """WITH seq AS (
        |  SELECT event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |t AS (
        |  SELECT prev_type, event_type AS next_type, count(*) AS n_transitions
        |  FROM seq WHERE prev_type IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT prev_type, next_type, n_transitions,
        |  round(n_transitions / sum(n_transitions) OVER (PARTITION BY prev_type), 6) AS p
        |FROM t ORDER BY prev_type, next_type""".stripMargin,
    "events_resample_ffill" ->
      """WITH agg AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    round(sum(value), 4) AS sum_value
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM agg GROUP BY 1),
        |grid AS (
        |  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        |  FROM bounds),
        |joined AS (
        |  SELECT g.event_type, g.h, a.sum_value
        |  FROM grid g LEFT JOIN agg a ON a.event_type = g.event_type AND a.h = g.h)
        |SELECT event_type, CAST(epoch(h) AS BIGINT) AS hour_s,
        |  sum_value IS NULL AS was_gap,
        |  coalesce(sum_value, last_value(sum_value IGNORE NULLS) OVER (
        |    PARTITION BY event_type ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) AS filled
        |FROM joined
        |ORDER BY event_type, hour_s""".stripMargin,
    // identical md5-derived integer sketch on both sides: the estimate
    // itself hash-matches, and the one-sided CMS guarantee is a column
    "sketch_count_min" ->
      s"""WITH ev AS (SELECT user_id FROM events),
         |cells AS (
         |  SELECT j.j,
         |    CAST(('0x' || substr(md5(j.j || ':' || user_id), 1, 8)) AS BIGINT) % $CmsWidth AS bucket,
         |    count(*) AS cnt
         |  FROM ev, generate_series(0, ${CmsDepth - 1}) j(j)
         |  GROUP BY 1, 2),
         |q AS (
         |  SELECT user_id, count(*) AS n_exact
         |  FROM ev WHERE user_id % 7 = 0 GROUP BY 1),
         |qj AS (
         |  SELECT q.user_id, q.n_exact, j.j,
         |    CAST(('0x' || substr(md5(j.j || ':' || q.user_id), 1, 8)) AS BIGINT) % $CmsWidth AS bucket
         |  FROM q, generate_series(0, ${CmsDepth - 1}) j(j))
         |SELECT user_id, n_exact, min(cnt) AS n_est,
         |  min(cnt) >= n_exact AS never_underestimates
         |FROM qj JOIN cells USING (j, bucket)
         |GROUP BY user_id, n_exact
         |ORDER BY user_id""".stripMargin,
    // bucketing is result-invisible: the oracle is the plain range join
    "events_promo_attribution" ->
      """WITH hours AS (
        |  SELECT date_trunc('hour', ts) AS h, count(*) AS n
        |  FROM events GROUP BY 1),
        |top AS (
        |  SELECT h - INTERVAL 30 MINUTE AS w_start,
        |         h + INTERVAL 90 MINUTE AS w_end
        |  FROM hours ORDER BY n DESC, h LIMIT 5)
        |SELECT CAST(epoch(w_start) AS BIGINT) AS w_start_s,
        |  CAST(epoch(w_end) AS BIGINT) AS w_end_s,
        |  count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  round(sum(value), 4) AS sum_value
        |FROM top JOIN events e ON e.ts >= w_start AND e.ts < w_end
        |GROUP BY 1, 2 ORDER BY w_start_s""".stripMargin,
    // every event belongs to exactly length/slide = 4 sliding windows:
    // starts (floor(epoch/900) - i) * 900 for i in 0..3, matching
    // Spark's epoch-aligned window(ts, '1 hour', '15 minutes')
    "events_sliding_volume" ->
      """WITH w AS (
        |  SELECT event_type, user_id, value,
        |    CAST((floor(epoch(ts) / 900) - i) * 900 AS BIGINT) AS window_start_s
        |  FROM events, unnest([0, 1, 2, 3]) t(i))
        |SELECT window_start_s, window_start_s + 3600 AS window_end_s, event_type,
        |  count(*) AS n_events, round(sum(value), 6) AS sum_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM w GROUP BY 1, 2, 3
        |ORDER BY window_start_s, event_type""".stripMargin,
    "events_funnel_ttc" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
        |  FROM events GROUP BY 1),
        |deltas AS (
        |  SELECT 'click_to_view' AS stage_pair,
        |    epoch_us(first_view) - epoch_us(first_click) AS d_us
        |  FROM pu
        |  WHERE first_click IS NOT NULL AND first_view IS NOT NULL
        |    AND first_view >= first_click
        |  UNION ALL
        |  SELECT 'view_to_purchase',
        |    epoch_us(first_purchase) - epoch_us(first_view)
        |  FROM pu
        |  WHERE first_click IS NOT NULL AND first_view IS NOT NULL
        |    AND first_view >= first_click
        |    AND first_purchase IS NOT NULL AND first_purchase >= first_view)
        |SELECT stage_pair, count(*) AS n_converted,
        |  round(quantile_cont(d_us, 0.5) / 1000000.0, 6) AS p50_s,
        |  round(quantile_cont(d_us, 0.9) / 1000000.0, 6) AS p90_s
        |FROM deltas GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_cohort_ltv" ->
      """WITH ev AS (
        |  SELECT user_id, date_trunc('day', ts) AS day, value FROM events),
        |coh AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1),
        |pa AS (
        |  SELECT c.cohort_day, date_diff('day', c.cohort_day, e.day) AS age,
        |    count(DISTINCT e.user_id) AS n_users,
        |    sum(CAST(round(e.value * 1000000.0, 0) AS BIGINT)) AS v6
        |  FROM ev e JOIN coh c ON c.user_id = e.user_id
        |  WHERE date_diff('day', c.cohort_day, e.day) <= 7
        |  GROUP BY 1, 2),
        |cum AS (
        |  SELECT *, sum(v6) OVER (
        |    PARTITION BY cohort_day ORDER BY age ROWS UNBOUNDED PRECEDING) AS cum_v6
        |  FROM pa),
        |sz AS (SELECT cohort_day, n_users AS cohort_size FROM pa WHERE age = 0)
        |SELECT c.cohort_day, c.age, c.n_users, s.cohort_size,
        |  round(cum_v6 / 1000000.0, 6) AS cum_value,
        |  round(cum_v6 / s.cohort_size / 1000000.0, 6) AS ltv_per_user
        |FROM cum c JOIN sz s USING (cohort_day)
        |ORDER BY c.cohort_day, c.age""".stripMargin,
    "events_attribution_multitouch" ->
      """WITH clicks AS (
        |  SELECT user_id, ts AS c_ts, event_id AS click_id,
        |    unnest([CAST(floor(epoch(ts)) AS BIGINT) // 1800,
        |            CAST(floor(epoch(ts)) AS BIGINT) // 1800 + 1]) AS b
        |  FROM events WHERE event_type = 'click'),
        |purch AS (
        |  SELECT user_id, ts AS p_ts, event_id AS purchase_id, value,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 1800 AS b
        |  FROM events WHERE event_type = 'purchase'),
        |pairs AS (
        |  SELECT DISTINCT p.purchase_id, c.click_id, c.c_ts, p.value
        |  FROM purch p
        |  JOIN clicks c ON c.user_id = p.user_id AND c.b = p.b
        |  WHERE c.c_ts <= p.p_ts AND c.c_ts > p.p_ts - INTERVAL 30 MINUTE),
        |kc AS (SELECT *, count(*) OVER (PARTITION BY purchase_id) AS k FROM pairs),
        |cr AS (
        |  SELECT date_trunc('hour', c_ts) AS click_hour, purchase_id,
        |    CAST(round(value * 1000000.0 / k, 0) AS BIGINT) AS credit6
        |  FROM kc)
        |SELECT click_hour, count(*) AS n_credits,
        |  count(DISTINCT purchase_id) AS n_purchases,
        |  round(sum(credit6) / 1000000.0, 6) AS credited_value
        |FROM cr GROUP BY click_hour ORDER BY click_hour""".stripMargin,
    "events_forecast_eval" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |joined AS (
        |  SELECT a.event_type, a.day, a.n, f.n AS f
        |  FROM daily a
        |  JOIN daily f ON f.event_type = a.event_type
        |    AND f.day = a.day - CAST(7 AS INT)),
        |scored AS (
        |  SELECT event_type, n, f,
        |    CAST(round(abs(n - f) * 1000000.0 / n, 0) AS BIGINT) AS ape6
        |  FROM joined)
        |SELECT event_type, count(*) AS n_days,
        |  round(sum(ape6) / count(*) / 1000000.0, 6) AS mape,
        |  round(sum(n - f) / count(*), 6) AS mean_err
        |FROM scored GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "events_uniques_sliding" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |daily AS (SELECT day, count(*) AS uniques_1d FROM ud GROUP BY day),
        |contrib AS (
        |  SELECT user_id, day + CAST(o.o AS INT) AS w_end
        |  FROM ud, generate_series(0, 6) o(o)),
        |w7 AS (
        |  SELECT w_end, count(DISTINCT user_id) AS uniques_7d
        |  FROM contrib GROUP BY w_end)
        |SELECT d.day, d.uniques_1d, w.uniques_7d
        |FROM daily d JOIN w7 w ON w.w_end = d.day
        |ORDER BY d.day""".stripMargin,
    "events_windowed_topk" ->
      """WITH c AS (
        |  SELECT date_trunc('hour', ts) AS hour, user_id,
        |    count(*) AS n_events, round(sum(value), 6) AS sum_value
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY hour ORDER BY n_events DESC, user_id) AS rank
        |  FROM c)
        |SELECT hour, user_id, n_events, sum_value, rank
        |FROM r WHERE rank <= 3 ORDER BY hour, rank""".stripMargin,
    "events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(*) AS n_events, round(sum(value), 6) AS sum_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_sessionize" ->
      s"""WITH flagged AS (
         |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
         |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > $SessionGapMicros
         |    THEN 1 ELSE 0 END AS new_session
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |), numbered AS (
         |  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
         |  FROM flagged)
         |SELECT user_id, session_idx, min(ts) AS session_start,
         |  max(ts) AS session_end, count(*) AS n_events,
         |  round(sum(value), 6) AS sum_value
         |FROM numbered GROUP BY user_id, session_idx
         |ORDER BY user_id, session_idx""".stripMargin,
    "events_session_window" ->
      s"""WITH flagged AS (
         |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
         |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= $SessionGapMicros
         |    THEN 1 ELSE 0 END AS new_session
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |), numbered AS (
         |  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
         |  FROM flagged)
         |SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
         |  round(sum(value), 6) AS sum_value
         |FROM numbered GROUP BY user_id, session_idx
         |ORDER BY user_id, session_start""".stripMargin,
    "events_json_kpis" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(k) AS n_parsed, CAST(sum(k) AS BIGINT) AS sum_k, round(avg(k), 6) AS avg_k
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS INT) AS k
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // DuckDB's native ASOF JOIN is the oracle for the composed plan;
    // ties on (user_id, ts) between clicks are broken toward the larger
    // event_id in both engines (struct max / MAX BY below)
    "events_asof_join" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, max(event_id) AS event_id
        |  FROM events WHERE event_type = 'click'
        |  GROUP BY user_id, ts),
        |purchases AS (
        |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
        |  c.event_id AS click_id, c.ts AS click_ts,
        |  round((epoch_us(p.ts) - epoch_us(c.ts)) / 1e6, 6) AS gap_s
        |FROM purchases p
        |ASOF JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY purchase_id""".stripMargin,
    // the native-operator twin asserts the identical result set
    "events_asof_native" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, max(event_id) AS event_id
        |  FROM events WHERE event_type = 'click'
        |  GROUP BY user_id, ts),
        |purchases AS (
        |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
        |  c.event_id AS click_id, c.ts AS click_ts,
        |  round((epoch_us(p.ts) - epoch_us(c.ts)) / 1e6, 6) AS gap_s
        |FROM purchases p
        |ASOF JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY purchase_id""".stripMargin,
    // Both engines assert the same semantic claim — the HLL estimate is
    // within 5% of exact — so the differing sketch implementations
    // never reach the hashed output.
    // same engine-agnostic contract: DuckDB's HLL answers the identical
    // within-5% claim (it has no mergeable-sketch SQL surface, so the
    // reuse aspect is Spark-side only; the asserted semantics match)
    "sketch_hll_union" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS n_exact,
        |  abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
        |    / CAST(count(DISTINCT user_id) AS DOUBLE) <= 0.05 AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "sketch_distinct_users" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS n_exact,
        |  abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
        |    / CAST(count(DISTINCT user_id) AS DOUBLE) <= 0.05 AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_hourly_anomaly" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |win AS (
        |  SELECT *, avg(n_events) OVER w AS mu, stddev_pop(n_events) OVER w AS sigma
        |  FROM hourly
        |  WINDOW w AS (PARTITION BY event_type ORDER BY hour
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT hour, event_type, n_events, round(mu, 6) AS mu,
        |  round((n_events - mu) / sigma, 6) AS z,
        |  abs(round((n_events - mu) / sigma, 6)) > 3 AS is_anomaly
        |FROM win WHERE sigma > 0
        |ORDER BY hour, event_type""".stripMargin,
    "events_funnel" ->
      """WITH per_user AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
        |  FROM events GROUP BY user_id)
        |SELECT user_id,
        |  (first_click IS NOT NULL) AS reached_click,
        |  coalesce(first_click IS NOT NULL AND first_view >= first_click, false) AS reached_view,
        |  coalesce(first_click IS NOT NULL AND first_view >= first_click
        |    AND first_purchase >= first_view, false) AS reached_purchase
        |FROM per_user ORDER BY user_id""".stripMargin,
    "events_retention" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
        |cohorts AS (
        |  SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id)
        |SELECT cohort_day, date_diff('day', cohort_day, day) AS day_offset,
        |  count(DISTINCT d.user_id) AS n_users
        |FROM days d JOIN cohorts c ON d.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,
    // both engines assert the same claim: their own sketch quantile is
    // within 5% of their own exact quantile (p50_exact itself is exact
    // interpolated in both, so it hash-compares directly)
    "events_quantiles_approx" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50_exact,
        |  (abs(approx_quantile(value, 0.5) - quantile_cont(value, 0.5)) <= 0.05
        |   OR abs(approx_quantile(value, 0.5) - quantile_cont(value, 0.5))
        |      / abs(quantile_cont(value, 0.5)) <= 0.05) AS p50_ok,
        |  (abs(approx_quantile(value, 0.9) - quantile_cont(value, 0.9)) <= 0.05
        |   OR abs(approx_quantile(value, 0.9) - quantile_cont(value, 0.9))
        |      / abs(quantile_cont(value, 0.9)) <= 0.05) AS p90_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_quantiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90,
        |  round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_unpivot_daily" ->
      """SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n_events
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "events_daily_pivot" ->
      """SELECT date_trunc('day', ts) AS day,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'view') AS view,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'error') AS error
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "events_cep_pattern" ->
      """WITH seq AS (
        |  SELECT user_id,
        |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY user_id)
        |SELECT user_id, length(seq) AS seq_len,
        |  len(regexp_extract_all(seq, 'vc*p')) AS n_conversions,
        |  len(regexp_extract_all(seq, 'ee+')) AS n_error_bursts,
        |  len(regexp_extract_all(seq, 'vc*p')) > 0 AS converted
        |FROM seq ORDER BY user_id""".stripMargin,
    "events_ema" -> emaOracleSql)

  /** Oracle rendering of [[eventsEma]], generated from the SAME
    * [[emaWeights]] so both engines evaluate the identical weighted sum
    * term by term (Double.toString round-trips each exact weight).
    */
  private lazy val emaOracleSql: String = {
    val lags = (1 until EmaK)
      .map(k => s"lag(value, $k) OVER w AS v$k").mkString(", ")
    def term(k: Int): String =
      if (k == 0) s"coalesce(value * ${emaWeights(k)}, 0.0)"
      else s"coalesce(v$k * ${emaWeights(k)}, 0.0)"
    def present(k: Int): String =
      if (k == 0) s"CASE WHEN value IS NOT NULL THEN ${emaWeights(k)} ELSE 0.0 END"
      else s"CASE WHEN v$k IS NOT NULL THEN ${emaWeights(k)} ELSE 0.0 END"
    val num = (0 until EmaK).map(term).mkString(" + ")
    val den = (0 until EmaK).map(present).mkString(" + ")
    s"""WITH l AS (
       |  SELECT user_id, ts, event_id, value, $lags
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       |SELECT user_id, ts, event_id, value,
       |  round(($num) / ($den), 6) AS ema
       |FROM l ORDER BY user_id, ts, event_id""".stripMargin
  }
}

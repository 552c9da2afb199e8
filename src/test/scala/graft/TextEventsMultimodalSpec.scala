package graft

import graft.operators.{Dedup, Events, Multimodal, TextAnalysis}
import org.apache.spark.sql.functions._

class TextEventsMultimodalSpec extends SparkTestBase {

  test("every text/events/multimodal query returns rows") {
    (TextAnalysis.queries ++ Events.queries ++ Multimodal.queries).foreach {
      case (name, fn) => assert(fn(spark, sfDir).count() > 0, s"$name returned no rows")
    }
  }

  test("text_tokens: BPE-ish pieces never fewer than whitespace tokens") {
    val df = TextAnalysis.textTokens(spark, sfDir)
    assert(df.filter(col("n_bpe_tokens") < col("n_ws_tokens")).count() == 0)
    assert(df.filter(col("n_ws_tokens") <= 0).count() == 0)
  }

  test("text_quality: ratios in [0,1], score in (0,1), observed chars match n_chars") {
    val df = TextAnalysis.textQuality(spark, sfDir).cache()
    Seq("punct_ratio", "upper_ratio", "stopword_ratio", "quality_score").foreach { c =>
      assert(df.filter(col(c) < 0 || col(c) > 1).count() == 0, s"$c out of range")
    }
    val joined = df.join(Tables.documents(spark, sfDir), "doc_id")
    assert(joined.filter(col("n_chars_obs") =!= col("n_chars")).count() == 0)
  }

  test("text_langid: prediction is a known code or und, and matches hit counts") {
    val df = TextAnalysis.textLangid(spark, sfDir).cache()
    val langs = df.select("lang_pred").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de", "fr", "es", "und")))
    // when predicted l, hits_l is the max hit count
    val bad = df.filter(col("lang_pred") === "en" &&
      (col("hits_en") < col("hits_de") || col("hits_en") < col("hits_fr") ||
        col("hits_en") < col("hits_es") || col("hits_en") === 0))
    assert(bad.count() == 0)
  }

  test("text_ngram_topk and text_length_hist: bounded output, totals consistent") {
    val topk = TextAnalysis.textNgramTopk(spark, sfDir).cache()
    assert(topk.count() <= 20 && topk.count() > 0)
    // descending counts
    val counts = topk.select("n").collect().map(_.getLong(0)).toSeq
    assert(counts == counts.sorted.reverse)
    val hist = TextAnalysis.textLengthHistogram(spark, sfDir)
    assert(hist.agg(sum("n_docs")).head().getLong(0) ==
      Tables.documents(spark, sfDir).count())
    assert(hist.filter(col("bucket_start") % 50 =!= 0).count() == 0)
  }

  test("text_bm25_topk: bounded descending ranking dominated by the rarest term") {
    val top = TextAnalysis.textBm25Topk(spark, sfDir).cache()
    assert(top.count() == 10)
    val scores = top.orderBy(col("score").desc, col("doc_id"))
      .select("score").collect().map(_.getDouble(0)).toSeq
    assert(scores == scores.sorted.reverse)
    assert(scores.forall(_ > 0))
    // the rarest df term is the high-idf signal: every top-10 doc must
    // actually contain at least one query term (n_terms_hit >= 1), and
    // hit counts never exceed the query size
    assert(top.filter(col("n_terms_hit") < 1 || col("n_terms_hit") > 3).count() == 0)
    // scoring only ever sees query-term postings: a doc made of ONLY
    // non-query terms cannot appear — cross-check against the corpus:
    // every ranked doc's text contains at least one of the 3 rarest terms
    val docs = Tables.documents(spark, sfDir)
    val joined = top.join(docs, "doc_id")
    assert(joined.count() == 10)
  }

  test("text_bigram_familiarity: gram counts line up and duplicate docs score identically") {
    import graft.operators.TextAnalysis
    val fam = TextAnalysis.textBigramFamiliarity(spark, sfDir).cache()
    // n_grams = n_tokens - 1 for every multi-token doc (frequency-weighted)
    val toks = TextAnalysis.textTokens(spark, sfDir).select("doc_id", "n_ws_tokens")
    val off = fam.join(toks, "doc_id")
      .filter(col("n_grams") =!= col("n_ws_tokens") - 1)
    assert(off.count() == 0)
    // every bigram occurs at least once (its own occurrence) → score >= 1
    assert(fam.filter(col("avg_gram_count") < 1.0).count() == 0)
    // exact-duplicate documents must score identically
    val dups = Dedup.dedupExact(spark, sfDir)
      .select(col("doc_id"), col("canonical_id"))
      .filter(col("doc_id") =!= col("canonical_id"))
    val mismatch = dups
      .join(fam.select(col("doc_id"), col("avg_gram_count").as("s1")), "doc_id")
      .join(fam.select(col("doc_id").as("canonical_id"), col("avg_gram_count").as("s2")), "canonical_id")
      .filter(col("s1") =!= col("s2"))
    assert(mismatch.count() == 0)
  }

  test("text_fingerprint: fp60 is the 15-hex-digit prefix of fp_md5, duplicates share fingerprints") {
    val df = TextAnalysis.textFingerprint(spark, sfDir)
    val bad = df.filter(
      conv(substring(col("fp_md5"), 1, 15), 16, 10).cast("bigint") =!= col("fp60"))
    assert(bad.count() == 0)
    assert(df.filter(col("fp60") < 0).count() == 0)
  }

  test("events_hourly: hours are truncated, totals add up to the table") {
    val df = Events.eventsHourly(spark, sfDir).cache()
    assert(df.filter(minute(col("hour")) =!= 0 || second(col("hour")) =!= 0).count() == 0)
    val total = df.agg(sum("n_events")).head().getLong(0)
    assert(total == Tables.events(spark, sfDir).count())
  }

  test("events_sessionize: sessions partition the events, gaps within a session <= 30min") {
    val df = Events.eventsSessionize(spark, sfDir).cache()
    val total = df.agg(sum("n_events")).head().getLong(0)
    assert(total == Tables.events(spark, sfDir).count())
    // consecutive sessions of a user are separated by > 30 min
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("session_idx")
    val overlap = df
      .withColumn("prev_end", lag(col("session_end"), 1).over(w))
      .filter(col("prev_end").isNotNull &&
        unix_micros(col("session_start")) - unix_micros(col("prev_end")) <= 30L * 60 * 1000000)
    assert(overlap.count() == 0)
  }

  test("events_quantiles: monotone percentiles per type") {
    val df = Events.eventsValueQuantiles(spark, sfDir)
    assert(df.count() == 5)
    assert(df.filter(col("p50") > col("p90") || col("p90") > col("p99")).count() == 0)
  }

  test("events_daily_pivot: per-day type counts sum to the table size") {
    val df = Events.eventsDailyPivot(spark, sfDir).cache()
    val cols = Seq("click", "view", "purchase", "signup", "error")
    assert(df.columns.toSet == (cols :+ "day").toSet)
    val total = df.select(cols.map(c => sum(col(c))).reduce(_ + _)).head().getLong(0)
    assert(total == Tables.events(spark, sfDir).count())
  }

  test("sketch_distinct_users: HLL estimate within the declared error band") {
    val df = Events.sketchDistinctUsers(spark, sfDir).cache()
    assert(df.count() == 5)
    // rsd 0.02 → the 5% approx_ok bound must hold for every group, and
    // n_exact must equal an independent exact count
    assert(df.filter(!col("approx_ok")).count() == 0)
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
    assert(df.join(exact, "event_type").filter(col("n_exact") =!= col("n")).count() == 0)
  }

  test("events_funnel_ttc: converted counts match the funnel flags, percentiles ordered and nonnegative") {
    val ttc = Events.eventsFunnelTtc(spark, sfDir).cache()
    val m = ttc.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val funnel = Events.eventsFunnel(spark, sfDir).cache()
    assert(m("click_to_view")._1 == funnel.filter(col("reached_view")).count())
    assert(m("view_to_purchase")._1 == funnel.filter(col("reached_purchase")).count())
    m.values.foreach { case (_, p50, p90) =>
      assert(p50 >= 0 && p90 >= p50, s"percentiles out of order: $p50 / $p90")
    }
    funnel.unpersist(); ttc.unpersist()
  }

  test("events_cohort_ltv: cumulative value monotone in age, age-0 users equal cohort size") {
    val df = Events.eventsCohortLtv(spark, sfDir).cache()
    assert(df.count() > 0)
    assert(df.filter(col("age") < 0 || col("age") > 7).count() == 0)
    // cumulative value never decreases with age within a cohort
    // (values are nonnegative)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cohort_day")).orderBy(col("age"))
    val withPrev = df.withColumn("prev", lag(col("cum_value"), 1).over(w))
    assert(withPrev.filter(col("prev").isNotNull && col("cum_value") < col("prev")).count() == 0)
    // the age-0 row's n_users IS the cohort size
    assert(df.filter(col("age") === 0)
      .filter(col("n_users") =!= col("cohort_size")).count() == 0)
    // retention consistency: per-age users never exceed the cohort size
    assert(df.filter(col("n_users") > col("cohort_size")).count() == 0)
    df.unpersist()
  }

  test("events_attribution_multitouch: credit conservation — hourly credits sum to attributed purchase value") {
    val df = Events.eventsAttributionMultitouch(spark, sfDir).cache()
    assert(df.count() > 0)
    val credited = df.agg(sum(col("credited_value"))).head().getDouble(0)
    // total credited value must equal the total value of purchases
    // that HAVE at least one click in their window (each purchase's
    // value splits into k parts of round(v/k) — conservation up to
    // the 1e-6-per-part rounding)
    val ev = graft.Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
    val attributed = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id"), col("value"))
      .join(clicks, Seq("user_id"))
      .filter(col("c_ts") <= col("p_ts") &&
        col("c_ts") > col("p_ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("event_id"), col("value")).distinct()
      .agg(sum(col("value"))).head().getDouble(0)
    val nPairs = df.agg(sum(col("n_credits"))).head().getLong(0)
    assert(math.abs(credited - attributed) <= nPairs * 1e-6 + 1e-4,
      f"credited $credited%.4f vs attributed purchase value $attributed%.4f")
    df.unpersist()
  }

  test("events_forecast_eval: per-type MAPE matches a direct t-7 backtest") {
    val df = Events.eventsForecastEval(spark, sfDir).cache()
    assert(df.count() > 0)
    assert(df.filter(col("mape") < 0).count() == 0)
    // recompute one type's backtest directly
    val row = df.orderBy("event_type").limit(1).collect().head
    val (et, nDays, mape) = (row.getString(0), row.getLong(1), row.getDouble(2))
    val daily = graft.Tables.events(spark, sfDir)
      .filter(col("event_type") === et)
      .groupBy(col("ts").cast("date").as("day")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    val apes = daily.toSeq.flatMap { case (d, n) =>
      daily.get(d.minusDays(7)).map(f => math.round(math.abs(n - f) * 1e6 / n))
    }
    assert(apes.size.toLong == nDays)
    val expected = BigDecimal(apes.sum.toDouble / apes.size / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(mape - expected) < 1e-6, f"mape $mape%.6f vs direct $expected%.6f")
    df.unpersist()
  }

  test("events_uniques_sliding: 7d uniques bound 1d below and the 7-day exact union above") {
    val df = Events.eventsUniquesSliding(spark, sfDir).cache()
    assert(df.count() > 0)
    // WAU >= DAU on every day
    assert(df.filter(col("uniques_7d") < col("uniques_1d")).count() == 0)
    // spot-verify one day against a direct distinct over the 7-day span
    val probe = df.orderBy(col("day").desc).limit(1).collect().head
    val (day, w7) = (probe.getDate(0), probe.getLong(2))
    val direct = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").cast("date").as("d"))
      .filter(col("d") <= lit(day) && col("d") >= date_sub(lit(day), 6))
      .select("user_id").distinct().count()
    assert(w7 == direct, s"day $day: sliding $w7 vs direct $direct")
    df.unpersist()
  }

  test("events_windowed_topk: at most 3 per hour, ranks dense, counts match a direct re-count") {
    val df = Events.eventsWindowedTopk(spark, sfDir).cache()
    assert(df.groupBy("hour").count().filter(col("count") > 3).count() == 0)
    assert(df.filter(col("rank") < 1 || col("rank") > 3).count() == 0)
    // every reported count equals the direct (hour, user) aggregation
    val direct = graft.Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("user_id"))
      .agg(count(lit(1)).as("n_direct"))
    assert(df.join(direct, Seq("hour", "user_id"))
      .filter(col("n_events") =!= col("n_direct")).count() == 0)
    // rank 1 really is the hour's maximum
    val top = df.filter(col("rank") === 1).select(col("hour"), col("n_events").as("top_n"))
    assert(direct.join(top, "hour").filter(col("n_direct") > col("top_n")).count() == 0)
    df.unpersist()
  }

  test("sketch_kmv_setops: estimates within the k-governed error band of exact set algebra") {
    val est = Events.sketchKmvSetops(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(est.keySet == Set("a", "b", "union", "intersect", "diff_a_b"))
    // exact set algebra on the same month slices
    val li = graft.Tables.lineitem(spark, sfDir)
    def setOf(lo: String, hi: String) =
      li.filter(col("l_shipdate") >= lit(lo).cast("timestamp") &&
          col("l_shipdate") < lit(hi).cast("timestamp"))
        .select(col("l_partkey")).distinct()
    val a = setOf("1996-01-01", "1996-02-01").cache()
    val b = setOf("1996-02-01", "1996-03-01").cache()
    val nA = a.count().toDouble
    val nB = b.count().toDouble
    val nI = a.join(b, "l_partkey").count().toDouble
    val nU = nA + nB - nI
    val nD = nA - nI
    // KMV standard error is 1/sqrt(k-1) ~ 18% at k=32; allow 4 sigmas
    // for the set-op measures (their effective sample is smaller)
    def within(name: String, exact: Double, rel: Double): Unit =
      assert(math.abs(est(name) - exact) <= rel * exact + 1,
        f"$name: est ${est(name)}%.1f vs exact $exact%.1f beyond ±${rel * 100}%.0f%%")
    within("a", nA, 0.55); within("b", nB, 0.55); within("union", nU, 0.55)
    within("intersect", nI, 0.90); within("diff_a_b", nD, 0.90)
    // internal consistency: inclusion-exclusion on the sketch's own
    // θ-restricted counts is exact by construction only for i + d = a's
    // restricted count — assert the weaker monotonicities instead
    assert(est("intersect") <= math.min(est("a"), est("b")) * 1.9)
    assert(est("union") >= math.max(est("a"), est("b")) * 0.5)
    a.unpersist(); b.unpersist()
  }

  test("text_langid_eval: a valid confusion matrix — counts tile the corpus, shares sum to 1 per row") {
    val m = TextAnalysis.textLangidEval(spark, sfDir).cache()
    val total = m.agg(sum(col("n_docs"))).head().getLong(0)
    assert(total == graft.Tables.documents(spark, sfDir).count())
    val rowSums = m.groupBy("lang_declared")
      .agg(round(sum(col("share_of_declared")), 4).as("s"))
    assert(rowSums.filter(abs(col("s") - 1.0) > 0.001).count() == 0)
    // the matrix agrees cell-by-cell with a direct re-count of langid
    val direct = TextAnalysis.textLangid(spark, sfDir)
      .groupBy(col("lang_declared"), col("lang_pred")).count()
    assert(m.join(direct, Seq("lang_declared", "lang_pred"))
      .filter(col("n_docs") =!= col("count")).count() == 0)
    m.unpersist()
  }

  test("events_asof_join: click is the latest at-or-before the purchase") {
    val df = Events.eventsAsofJoin(spark, sfDir).cache()
    assert(df.count() > 0)
    assert(df.filter(col("click_ts") > col("purchase_ts")).count() == 0)
    assert(df.filter(col("gap_s") < 0).count() == 0)
    // no later click exists between the matched click and the purchase
    val clicks = Tables.events(spark, sfDir)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("u"), col("ts").as("c2_ts"))
    val better = df.join(clicks, col("user_id") === col("u"))
      .filter(col("c2_ts") > col("click_ts") && col("c2_ts") <= col("purchase_ts"))
    assert(better.count() == 0)
  }

  test("multimodal_meta: modality-typed metadata is consistent") {
    val df = Multimodal.multimodalMeta(spark, sfDir).cache()
    assert(df.filter(col("modality") === "audio" && col("width").isNotNull).count() == 0)
    assert(df.filter(col("modality") === "image" && col("duration_s").isNotNull).count() == 0)
    assert(df.filter(col("modality") === "video" &&
      (col("width").isNull || col("duration_s").isNull)).count() == 0)
    // payload length matches the declared byte count
    assert(df.filter(length(col("payload_hex")) =!= col("n_bytes") * 2).count() == 0)
  }

  test("multimodal_frames: at most 8 evenly spaced samples inside the clip") {
    val df = Multimodal.multimodalFrames(spark, sfDir).cache()
    assert(df.count() > 0)
    assert(df.filter(col("n_frames") > 8 || col("n_frames") < 1).count() == 0)
    assert(df.filter(col("frame_idx") >= col("n_frames")).count() == 0)
    // sample timestamps stay within the clip
    val meta = Multimodal.multimodalMeta(spark, sfDir)
      .filter(col("modality") === "video").select(col("doc_id"), col("duration_s"))
    val out = df.join(meta, "doc_id").filter(col("frame_ts") > col("duration_s"))
    assert(out.count() == 0)
    // frame counts per doc are dense: exactly n_frames rows
    val counts = df.groupBy("doc_id", "n_frames").count()
      .filter(col("count") =!= col("n_frames"))
    assert(counts.count() == 0)
  }

  test("events_funnel: stages are monotone and ordered by first occurrence") {
    val f = Events.eventsFunnel(spark, sfDir).cache()
    // a later stage implies every earlier stage
    assert(f.filter(col("reached_view") && !col("reached_click")).count() == 0)
    assert(f.filter(col("reached_purchase") && !col("reached_view")).count() == 0)
    val n = (c: String) => f.filter(col(c)).count()
    assert(n("reached_click") >= n("reached_view"))
    assert(n("reached_view") >= n("reached_purchase"))
    assert(n("reached_purchase") > 0)
  }

  test("text_perplexity_kn: distribution normalizes over the full vocabulary, unseen included") {
    // The published KN property: for every context w1, discounted seen
    // mass plus the reserved continuation mass sums to EXACTLY 1 over
    // the whole vocabulary - the numeric check runs the same knP
    // formula over the vocab cross product with unseen bigrams NULL.
    val (_, bg, ctx, cont, tot) = TextAnalysis.knComponents(spark, sfDir)
    val sums = ctx.crossJoin(cont).crossJoin(broadcast(tot))
      .join(bg, Seq("w1", "w2"), "left")
      .withColumn("p", TextAnalysis.knP(col("cbg")))
      .groupBy("w1").agg(sum(col("p")).as("mass"))
    assert(sums.filter(abs(col("mass") - 1.0) > 1e-9).count() == 0,
      "KN mass does not normalize to 1 per context")
    // probabilities are valid: every scored gram has p in (0, 1], so
    // cross-entropy is non-negative and finite
    val scored = TextAnalysis.textPerplexityKn(spark, sfDir)
    assert(scored.filter(col("cross_entropy") < 0 ||
      col("cross_entropy").isNull).count() == 0)
    assert(scored.count() ==
      TextAnalysis.textPerplexity(spark, sfDir).count())
  }

  test("text_hashing_features: buckets bounded, signed sums bounded by counts, totals tile") {
    val f = TextAnalysis.textHashingFeatures(spark, sfDir).cache()
    assert(f.count() > 0)
    assert(f.filter(col("bucket") < 0 || col("bucket") >= 256).count() == 0)
    // each bucket's signed sum moves by ±1 per token: |feat| <= n_toks
    // and the two always share parity
    assert(f.filter(abs(col("feat")) > col("n_toks")).count() == 0)
    assert(f.filter(pmod(col("feat") - col("n_toks"), lit(2)) =!= 0).count() == 0)
    // bucket counts tile the corpus token count exactly
    val total = f.agg(sum("n_toks")).head.getLong(0)
    val toksTotal = Tables.documents(spark, sfDir)
      .select(size(split(lower(trim(col("text"))), "\\s+")).as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(total == toksTotal, s"bucketed $total tokens of $toksTotal")
    f.unpersist()
  }

  test("events_cep_pattern: counts agree with funnel reachability and hand-built sequences") {
    val cep = Events.eventsCepPattern(spark, sfDir).cache()
    // one row per user, string length = user's event count
    val perUser = Tables.events(spark, sfDir).groupBy("user_id").count()
    assert(cep.count() == perUser.count())
    assert(cep.join(perUser, "user_id")
      .filter(col("seq_len") =!= col("count")).count() == 0)
    // a conversion needs a purchase: converted users have >= 1 'p'
    val nPurch = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id").count().withColumnRenamed("count", "n_p")
    assert(cep.join(nPurch, Seq("user_id"), "left")
      .filter(col("n_conversions") > coalesce(col("n_p"), lit(0L)))
      .count() == 0, "more conversions than purchases")
    assert(cep.filter(col("n_conversions") > 0).count() ==
      cep.filter(col("converted")).count())
    cep.unpersist()
    // hand-built sequences: non-overlapping leftmost-match semantics
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    // user 1: v c c p v p  -> vc*p at 1, vp at 5  => 2 conversions
    // user 2: p v c        -> purchase BEFORE the view: 0 conversions
    // user 3: e e e e      -> one maximal burst (greedy ee+)     => 1
    val planted = Seq(
      (1L, "view", 1L), (1L, "click", 2L), (1L, "click", 3L),
      (1L, "purchase", 4L), (1L, "view", 5L), (1L, "purchase", 6L),
      (2L, "purchase", 1L), (2L, "view", 2L), (2L, "click", 3L),
      (3L, "error", 1L), (3L, "error", 2L), (3L, "error", 3L), (3L, "error", 4L))
      .map { case (u, t, s) => (u, ts(s), s, t) }
      .toDF("user_id", "ts", "event_id", "event_type")
    val p = Events.cepPatternOver(planted).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(p(1L) == ((6L, 2L, 0L)), s"user1 ${p(1L)}")
    assert(p(2L) == ((3L, 0L, 0L)), s"user2 ${p(2L)}")
    assert(p(3L) == ((4L, 0L, 1L)), s"user3 ${p(3L)}")
  }

  test("events_ema: first row equals its value, ema bounded by trailing window extremes") {
    val df = Events.eventsEma(spark, sfDir).cache()
    assert(df.count() == Tables.events(spark, sfDir).count())
    // per user, the first event's ema is exactly its value (weight 1)
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val first = df.withColumn("rn", row_number().over(byUser)).filter(col("rn") === 1)
    assert(first.filter(abs(col("ema") - round(col("value"), 6)) > 1e-6).count() == 0)
    // a weighted mean never escapes the min/max of its window
    val lo = (0 until 8).map(k => lag(col("value"), k).over(byUser))
      .reduce((a, b) => least(a, coalesce(b, a)))
    val hi = (0 until 8).map(k => lag(col("value"), k).over(byUser))
      .reduce((a, b) => greatest(a, coalesce(b, a)))
    val bounded = df
      .withColumn("lo", lo).withColumn("hi", hi)
      .filter(col("ema") < round(col("lo"), 6) - 1e-6 ||
        col("ema") > round(col("hi"), 6) + 1e-6)
    assert(bounded.count() == 0, "ema escaped its trailing window bounds")
    df.unpersist()
  }

  test("events_retention: day-0 cohort count equals cohort size, offsets non-negative") {
    val r = Events.eventsRetention(spark, sfDir).cache()
    assert(r.filter(col("day_offset") < 0).count() == 0)
    val cohortSizes = Tables.events(spark, sfDir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .groupBy("user_id").agg(min("day").as("cohort_day"))
      .groupBy("cohort_day").count()
    val day0 = r.filter(col("day_offset") === 0).select(col("cohort_day"), col("n_users"))
    val bad = day0.join(cohortSizes, "cohort_day").filter(col("n_users") =!= col("count"))
    assert(bad.count() == 0)
  }

  test("multimodal_resize: fits the box, never upscales, integer-exact aspect") {
    val df = Multimodal.multimodalResize(spark, sfDir).cache()
    assert(df.count() > 0)
    assert(df.filter(col("target_w") > col("width") || col("target_h") > col("height")).count() == 0)
    assert(df.filter(col("is_downscaled") &&
      (greatest(col("target_w"), col("target_h")) > 224)).count() == 0)
    assert(df.filter(!col("is_downscaled") &&
      (col("target_w") =!= col("width") || col("target_h") =!= col("height"))).count() == 0)
    // integer floor math: target = dim * 224 div max(dim)
    val recheck = df.filter(col("is_downscaled")).filter(
      col("target_w") =!= expr("CAST(width AS BIGINT) * 224 div greatest(width, height)") ||
      col("target_h") =!= expr("CAST(height AS BIGINT) * 224 div greatest(width, height)"))
    assert(recheck.count() == 0)
  }

  test("multimodal_audio_chunks: windows tile the clip and end at its duration") {
    val chunks = Multimodal.multimodalAudioChunks(spark, sfDir).cache()
    assert(chunks.count() > 0)
    assert(chunks.filter(col("chunk_start") >= col("chunk_end")).count() == 0)
    assert(chunks.filter(col("chunk_start") =!= col("chunk_idx") * 5.0).count() == 0)
    // per doc: indices dense 0..n-1 and the final window closes the clip
    val meta = Multimodal.multimodalMeta(spark, sfDir)
      .filter(col("modality") === "audio").select(col("doc_id"), col("duration_s"))
    val last = chunks.groupBy("doc_id")
      .agg(max("chunk_idx").as("mi"), count(lit(1)).as("n"), max("chunk_end").as("e"))
    val bad = last.join(meta, "doc_id")
      .filter(col("n") =!= col("mi") + 1 || col("e") =!= round(col("duration_s"), 6))
    assert(bad.count() == 0)
  }

  test("bpe merge training reproduces a hand-computed merge sequence") {
    import spark.implicits._
    // corpus {aaab x3, ab x2}: round 1 counts (a,a)=6 > (a,b)=5 -> merge
    // (a,a); "aaab" becomes [aa,a,b] (greedy non-overlap: the third 'a'
    // does NOT merge with the new 'aa'); round 2 (a,b)=3+2=5 > (aa,a)=3;
    // round 3 only (aa,ab)=3 remains
    val words = Seq(("aaab", 3L), ("ab", 2L)).toDF("w", "n")
    val m = TextAnalysis.bpeMergesOver(words, 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(m == Seq((1, "a", "a", 6L), (2, "a", "b", 5L), (3, "aa", "ab", 3L)), m.toString)
  }

  test("bpe merges on the corpus: dense ranks, counts positive and non-increasing") {
    val m = TextAnalysis.textBpeMerges(spark, sfDir).collect()
    assert(m.length == 8)
    assert(m.map(_.getInt(0)).toSeq == (1 to 8))
    val counts = m.map(_.getLong(3))
    assert(counts.forall(_ > 0))
    // non-increasing is a BPE theorem: a new pair (x, lr) existed
    // before the merge as (x, l) adjacencies, so its count is bounded
    // by the previous round's maximum
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b }, counts.mkString(","))
  }

  test("bpe encoding: pieces bounded by chars below and words above, merges actually compress") {
    val enc = TextAnalysis.textBpeEncode(spark, sfDir).cache()
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(split(lower(trim(col("text"))), "\\s+")).as("nw"),
        length(regexp_replace(lower(trim(col("text"))), "\\s+", "")).as("nc"))
    val j = enc.join(docs, "doc_id").cache()
    // every word is >= 1 piece; no word splits below 1 symbol and none
    // exceeds its character count
    assert(j.filter(col("n_pieces") < col("n_words")).count() == 0)
    assert(j.filter(col("n_pieces") > col("nc")).count() == 0)
    assert(j.filter(col("n_words") =!= col("nw")).count() == 0)
    // 8 merges over a 31-term vocabulary must compress SOMETHING:
    // corpus-wide pieces strictly below corpus-wide characters
    val t = j.agg(sum("n_pieces"), sum("nc")).head()
    assert(t.getLong(0) < t.getLong(1), s"no compression: $t")
    enc.unpersist(); j.unpersist()
  }

  test("perceptual phash catches a near-identical payload byte-exact dedup misses") {
    import spark.implicits._
    // two payloads differing in ONE byte out of ~600: different md5
    // (byte-exact multimodal_dedup sees two distinct blobs) but the
    // flipped byte only perturbs PhashWindow overlapping feature
    // windows' votes, so the perceptual fingerprints stay within the
    // Hamming radius — the re-encoded-thumbnail class of duplicate
    val base = (1 to 100).map(i => s"tile$i").mkString(" ")
    val tweak = base.replace("tile50", "tilf50")
    val meta = Seq((1L, "image", base), (2L, "image", tweak),
        (3L, "image", (1 to 100).map(i => s"other$i").mkString(" ")))
      .toDF("doc_id", "modality", "text")
      .select(col("doc_id"), col("modality"),
        lower(hex(encode(col("text"), "UTF-8"))).as("payload_hex"),
        md5(col("text")).as("payload_md5"))
    // byte-exact pass: 3 distinct md5s, no duplicate to find
    assert(meta.select("payload_md5").distinct().count() == 3)
    val pairs = Multimodal.phashPairsOver(meta).collect()
    val caught = pairs.find(r => r.getLong(1) == 1L && r.getLong(2) == 2L)
    assert(caught.isDefined, s"near-identical pair not recalled: ${pairs.mkString(";")}")
    assert(!caught.get.getBoolean(4), "pair wrongly marked byte_identical")
    // the unrelated payload must not pair with either original
    assert(!pairs.exists(r => r.getLong(2) == 3L), s"false positive: ${pairs.mkString(";")}")
  }

  test("multimodal_phash_pairs invariants on the corpus: radius, ordering, served-twin equality") {
    val pairs = Multimodal.multimodalPhashPairs(spark, sfDir).cache()
    assert(pairs.filter(col("hamming") > 3).count() == 0)
    assert(pairs.filter(col("doc_a") >= col("doc_b")).count() == 0)
    // the planted re-encode variants sit at hamming <= 2 — the coarse
    // search must recall every one of them
    assert(pairs.count() > 0, "no perceptual pairs recalled on the corpus")
    // self-contained form == served twin (same fingerprints, same
    // coarse bands, same radius — only WHERE the fingerprints come
    // from differs)
    val r3 = Multimodal.multimodalPhashDctPairsR3(spark, sfDir)
    assert(pairs.exceptAll(r3).count() == 0)
    assert(r3.exceptAll(pairs).count() == 0)
    pairs.unpersist()
  }

  test("decodeBatched: stub decoder is deterministic, batch-bounded, and covers every row") {
    import spark.implicits._
    val media = Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        lit("image").as("modality"))
      .as[Multimodal.MediaRow]
    val decoded = Multimodal.decodeBatched(media).cache()
    assert(decoded.count() == media.count())
    // batches are capped at DecodeBatch rows
    val perBatch = decoded.groupBy("batch_ordinal").count()
      .agg(max("count")).head().getLong(0)
    assert(perBatch <= Multimodal.DecodeBatch)
    assert(decoded.filter(col("width") < 64 || col("height") < 64).count() == 0)
  }

  test("events_sliding_volume: 1h windows on a 15min grid, every event in exactly 4") {
    val df = Events.eventsSlidingVolume(spark, sfDir).cache()
    assert(df.filter(col("window_end_s") - col("window_start_s") =!= 3600L).count() == 0)
    assert(df.filter(col("window_start_s") % 900 =!= 0).count() == 0)
    // length/slide = 4 overlapping windows per event
    val total = df.agg(sum("n_events")).head().getLong(0)
    assert(total == 4L * Tables.events(spark, sfDir).count(), s"counted $total")
    df.unpersist()
  }

  test("text_tfidf_topk: ranks contiguous, scores ordered, rare terms beat stopwords") {
    val df = TextAnalysis.textTfidfTopk(spark, sfDir).cache()
    // at most 3 rows per doc, ranks are 1..n with no gaps
    val byDoc = df.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"), min("rank").as("mn"))
    assert(byDoc.filter(col("n") > 3 || col("mx") =!= col("n") || col("mn") =!= 1).count() == 0)
    // within a doc, score never increases as rank increases
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("rank")
    assert(df.withColumn("prev", lag(col("tfidf"), 1).over(w))
      .filter(col("prev").isNotNull && col("tfidf") > col("prev")).count() == 0)
    // idf does its job: a corpus-universal stopword ("the" appears in
    // most docs) should essentially never be a top-3 keyword
    val stopHits = df.filter(col("term") === "the").count()
    assert(stopHits < df.select("doc_id").distinct().count() / 10,
      s"'the' ranked top-3 in $stopHits docs — idf not discounting")
    df.unpersist()
  }

  test("text_repetition: fractions in range, flag consistent with thresholds") {
    val df = TextAnalysis.textRepetition(spark, sfDir).cache()
    Seq("top_bigram_frac", "dup_trigram_frac").foreach { c =>
      assert(df.filter(col(c) < 0 || col(c) > 1).count() == 0, s"$c out of range")
    }
    val inconsistent = df.filter(
      col("is_repetitive") =!=
        (col("top_bigram_frac") > 0.12 || col("dup_trigram_frac") > 0.03))
    assert(inconsistent.count() == 0)
    // the thresholds actually split the corpus (otherwise the flag is dead code)
    assert(df.filter(col("is_repetitive")).count() > 0)
    assert(df.filter(!col("is_repetitive")).count() > 0)
    df.unpersist()
  }

  test("doc_chunks: windows tile the token sequence with stride 24 / width 32") {
    val df = TextAnalysis.docChunks(spark, sfDir).cache()
    // every chunk is non-empty and at most the window width
    assert(df.filter(col("chunk_len") < 1 || col("chunk_len") > 32).count() == 0)
    // per doc: chunk count matches n_chunks, indices contiguous from 0,
    // and the last window reaches the end of the doc
    val perDoc = df.groupBy("doc_id").agg(
      count(lit(1)).as("n"), max("chunk_idx").as("last_idx"),
      first("n_chunks").as("n_chunks"), first("n_tokens").as("n_tokens"),
      max(col("start_token") + col("chunk_len") - 1).as("covered"))
    assert(perDoc.filter(col("n") =!= col("n_chunks")).count() == 0)
    assert(perDoc.filter(col("last_idx") =!= col("n_chunks") - 1).count() == 0)
    assert(perDoc.filter(col("covered") =!= col("n_tokens")).count() == 0)
    df.unpersist()
  }

  test("dedup_chunks: exactly one kept copy per hash, copy counts add up") {
    val df = TextAnalysis.dedupChunks(spark, sfDir).cache()
    val perHash = df.groupBy("chunk_hash").agg(
      sum(when(col("is_kept"), 1).otherwise(0)).as("n_kept"),
      count(lit(1)).as("n"), first("n_copies").as("n_copies"))
    assert(perHash.filter(col("n_kept") =!= 1).count() == 0)
    assert(perHash.filter(col("n") =!= col("n_copies")).count() == 0)
    // row count matches the chunking pass it composes
    assert(df.count() == TextAnalysis.docChunks(spark, sfDir).count())
    df.unpersist()
  }

  test("multimodal_dedup: one kept copy per (modality, hash), counts consistent") {
    val df = Multimodal.multimodalDedup(spark, sfDir).cache()
    val perKey = df.groupBy("modality", "payload_md5").agg(
      sum(when(col("is_kept"), 1).otherwise(0)).as("n_kept"),
      count(lit(1)).as("n"), first("n_copies").as("n_copies"))
    assert(perKey.filter(col("n_kept") =!= 1).count() == 0)
    assert(perKey.filter(col("n") =!= col("n_copies")).count() == 0)
    assert(df.count() == Tables.documents(spark, sfDir).count())
    df.unpersist()
  }

  test("etl_scd2_history: versions contiguous, intervals chain, one current row per key") {
    import graft.operators.EtlEnrichment
    val df = EtlEnrichment.scd2History(spark, sfDir).cache()
    // exactly one open (current) version per product
    val open = df.filter(col("is_current"))
      .groupBy("l_partkey").agg(count(lit(1)).as("n"))
    assert(open.filter(col("n") =!= 1).count() == 0)
    assert(df.filter(!col("is_current") && col("valid_to").isNull).count() == 0)
    // intervals chain: valid_to equals the next version's valid_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_partkey").orderBy("version")
    val chained = df
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("next_from").isNotNull && col("valid_to") =!= col("next_from"))
    assert(chained.count() == 0)
    // consecutive versions always change the price
    val samePrice = df
      .withColumn("next_price", lead(col("price"), 1).over(w))
      .filter(col("next_price").isNotNull && col("price") === col("next_price"))
    assert(samePrice.count() == 0)
    df.unpersist()
  }

  test("sketch_hll_union: merged daily sketches stay within the 5% band") {
    val df = Events.sketchHllUnion(spark, sfDir).cache()
    assert(df.count() > 0)
    assert(df.filter(col("n_exact") <= 0).count() == 0)
    assert(df.filter(!col("approx_ok")).count() == 0)
    df.unpersist()
  }

  test("events_unpivot_daily inverts the pivot and preserves totals") {
    val long = Events.eventsUnpivotDaily(spark, sfDir).cache()
    assert(long.count() == Events.eventsDailyPivot(spark, sfDir).count() * 5)
    assert(long.agg(sum("n_events")).head().getLong(0) ==
      Tables.events(spark, sfDir).count())
    // melt round-trips: re-pivoting the long form gives the wide counts back
    val repivot = long.groupBy("day")
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(first(col("n_events")))
    assert(repivot.exceptAll(Events.eventsDailyPivot(spark, sfDir)).count() == 0)
    long.unpersist()
  }


  test("text_entropy: bounds hold and repetition lowers entropy") {
    val df = TextAnalysis.textEntropy(spark, sfDir).cache()
    assert(df.count() == Tables.documents(spark, sfDir).count())
    // 0 <= H <= ln(n_distinct) (uniform upper bound), tolerance for rounding
    assert(df.filter(col("entropy") < -1e-6).count() == 0)
    assert(df.filter(col("entropy") > log(col("n_distinct")) + 1e-6).count() == 0)
    // single-token docs have zero entropy; all-distinct docs hit the bound
    assert(df.filter(col("n_distinct") === 1 && abs(col("entropy")) > 1e-6).count() == 0)
    assert(df.filter(col("n_distinct") === col("n_tokens")
      && abs(col("entropy") - log(col("n_tokens"))) > 1e-5).count() == 0)
    df.unpersist()
  }

  test("text_perplexity: perplexity = 2^H, bounded by the smoothed model, dups score identically") {
    val df = TextAnalysis.textPerplexity(spark, sfDir).cache()
    // every multi-token doc is scored
    val multi = Tables.documents(spark, sfDir)
      .filter(size(split(lower(trim(col("text"))), "\\s+")) >= 2).count()
    assert(df.count() == multi)
    // cross-entropy positive (smoothing keeps every p < 1), and
    // perplexity is its exponential (recompute within rounding slack)
    assert(df.filter(col("cross_entropy") <= 0).count() == 0)
    assert(df.filter(abs(pow(lit(2.0), col("cross_entropy")) - col("perplexity"))
      > col("perplexity") * 1e-4).count() == 0)
    // exact-duplicate docs share the same token stream → same score
    val dups = Dedup.dedupExact(spark, sfDir)
      .select(col("doc_id"), col("canonical_id"))
      .filter(col("doc_id") =!= col("canonical_id"))
    val mismatch = dups
      .join(df.select(col("doc_id"), col("perplexity").as("p1")), "doc_id")
      .join(df.select(col("doc_id").as("canonical_id"), col("perplexity").as("p2")),
        "canonical_id")
      .filter(col("p1") =!= col("p2"))
    assert(mismatch.count() == 0)
    df.unpersist()
  }

  test("dct phash: transform algebra and noise robustness on planted planes") {
    import Multimodal.{dctPhash64, fakeLuma, LumaGrid}
    // brightness invariance: a constant offset moves ONLY the DC
    // coefficient, so the hash is unchanged (the perceptual property a
    // byte hash cannot have). A flat plane is NOT asserted exact: its
    // non-DC coefficients are all ~0 and median thresholding on float
    // noise is degenerate — the documented edge of the published recipe.
    val base = Array.tabulate(LumaGrid * LumaGrid)(i => 100.0 + (i % 7) * 9.0)
    val brighter = base.map(_ + 55.0)
    assert(dctPhash64(base) == dctPhash64(brighter))
    // a horizontal cosine at the u=1 mode concentrates the plane's
    // energy in the (u=1, v=0) coefficient (index 8): that bit is set
    // (median thresholding splits the remaining ~zero coefficients
    // roughly in half by float noise — by design, the hash always
    // carries ~32 set bits, which is what makes hamming distances
    // comparable)
    val cosPlane = Array.tabulate(LumaGrid * LumaGrid) { i =>
      val x = i / LumaGrid
      128.0 + 50.0 * math.cos((2 * x + 1) * math.Pi / (2 * LumaGrid))
    }
    assert(((dctPhash64(cosPlane) >> 8) & 1L) == 1L)
    // near-identical payloads (few flipped bytes) → small hamming;
    // unrelated payloads → large
    val rnd = new scala.util.Random(7)
    val p1 = Array.fill(4096)(rnd.nextInt(256).toByte)
    val p2 = p1.clone(); (0 until 8).foreach(i => p2(i * 500) = (p2(i * 500) ^ 0x7f).toByte)
    val p3 = Array.fill(4096)(rnd.nextInt(256).toByte)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val (h1, h2, h3) = (dctPhash64(fakeLuma(p1)), dctPhash64(fakeLuma(p2)),
      dctPhash64(fakeLuma(p3)))
    assert(ham(h1, h2) <= Multimodal.DctRadius, s"near-dup hamming ${ham(h1, h2)}")
    assert(ham(h1, h3) > Multimodal.DctRadius, s"unrelated hamming ${ham(h1, h3)}")
  }

  test("multimodal_phash_dct end-to-end: fingerprints for every doc, banded pairs verified") {
    val fp = Multimodal.multimodalPhashDct(spark, sfDir).cache()
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(fp.count() > nDocs) // originals + injected re-encode variants
    val pairs = Multimodal.multimodalPhashDctPairs(spark, sfDir).cache()
    // every injected re-encode variant is recovered as a near-dup of
    // its original — the perceptual-only match class byte dedup misses
    val offset = Multimodal.reencodeIdOffset(spark, sfDir)
    val recovered = pairs.filter(
      col("doc_b") === col("doc_a") + offset).count()
    val planted = fp.filter(col("doc_id") >= offset).count()
    assert(planted > 0 && recovered == planted,
      s"$recovered of $planted re-encoded variants recovered")
    // every reported pair is within radius, same modality, a < b
    assert(pairs.filter(col("hamming") > Multimodal.DctRadius).count() == 0)
    assert(pairs.filter(col("doc_a") >= col("doc_b")).count() == 0)
    // pigeonhole losslessness: the banded search finds EVERY pair the
    // brute-force hamming join would (radius < bands)
    val brute = fp.select(col("modality"), col("doc_id").as("doc_a"), col("phash64").as("fa"))
      .join(fp.select(col("modality"), col("doc_id").as("doc_b"), col("phash64").as("fb")),
        Seq("modality"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", expr("bit_count(fa ^ fb)").cast("long"))
      .filter(col("hamming") <= Multimodal.DctRadius)
    assert(pairs.count() == brute.count())
    // the artifact-served twin computes the identical relation from the
    // persisted fingerprint table
    val served = Multimodal.multimodalPhashDctPairsServed(spark, sfDir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSeq
    assert(rows(served) == rows(pairs.orderBy(col("doc_a"), col("doc_b"))))
    // the coarse production banding (4×16-bit, radius 3) is lossless at
    // ITS radius: banded ≡ brute-force hamming ≤ 3, and every planted
    // re-encode variant (all at hamming ≤ 2) is still recovered
    val r3 = Multimodal.multimodalPhashDctPairsR3(spark, sfDir).cache()
    assert(rows(r3) == rows(
      brute.filter(col("hamming") <= Multimodal.DctRadiusCoarse)
        .select("modality", "doc_a", "doc_b", "hamming")
        .orderBy(col("doc_a"), col("doc_b"))))
    val recoveredR3 = r3.filter(
      col("doc_b") === col("doc_a") + offset).count()
    assert(recoveredR3 == planted,
      s"coarse banding lost re-encode variants: $recoveredR3 of $planted")
    r3.unpersist()
    fp.unpersist(); pairs.unpersist()
  }

  test("phash sensitivity: observed mass is the fine search's true counts; 1.0 rows equal the r3 form") {
    val t = Multimodal.multimodalPhashSensitivity(spark, sfDir).cache()
    val rows = t.orderBy(col("hamming")).collect()
    assert(rows.length == 17)
    // below the calibration target the audit is the exact full count:
    // mod = 1 and the estimate equals the raw observed
    rows.foreach { r =>
      assert(r.getLong(3) == 1L, "corpus under target must use mod=1")
      assert(r.getLong(1) == r.getLong(2), "mod=1 estimate must be exact")
    }
    // observed column comes from the radius-10 fine search
    rows.filter(_.getLong(0) > Multimodal.DctRadius)
      .foreach(r => assert(r.getLong(1) == 0L, s"pair beyond the fine radius at $r"))
    assert(rows.map(_.getLong(1)).sum > 0)
    // the analytic 4x16 column prices the coarse production form
    // against TRUE mass: its 1.0 rows (h <= 3) carry exactly the pair
    // count the r3 query reports
    val sureMass = rows.filter(_.getDouble(4) == 1.0).map(_.getLong(1)).sum
    assert(sureMass == Multimodal.multimodalPhashDctPairsR3(spark, sfDir).count(),
      "p_b4x16 = 1.0 mass diverges from the coarse-banded query")
    t.unpersist()
  }

  test("phash sensitivity: calibration sample preserves the grid and scales mass by mod^2") {
    val full = Multimodal.multimodalPhashSensitivityAt(spark, sfDir, 1000000)
      .orderBy(col("hamming")).collect()
    // force a real modulus (> 1) on the small test corpus
    val samp = Multimodal.multimodalPhashSensitivityAt(spark, sfDir, 125)
      .orderBy(col("hamming")).collect()
    assert(samp.length == 17 && full.length == 17)
    val mod = samp.head.getLong(3)
    assert(mod > 1L, "target 125 must force sampling on the test corpus")
    samp.zip(full).foreach { case (s, f) =>
      assert(s.getLong(0) == f.getLong(0))
      // the analytic columns are corpus-independent — bit-equal
      (4 to 6).foreach(c => assert(s.getDouble(c) == f.getDouble(c)))
      assert(s.getLong(3) == mod)
      assert(s.getLong(1) == s.getLong(2) * mod * mod,
        "estimate must be obs x mod^2")
    }
    // the sample genuinely shrank the fine self-join's input
    assert(samp.map(_.getLong(2)).sum < full.map(_.getLong(2)).sum,
      "sample did not shrink the observed join")
  }

}

package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The CAPPED pair tier's contract (VERDICT r14 item 1) and the
  * fusion caps' ANSWER cost (item 2). The capped operators trade
  * measured recall for bounded cost; this spec (a) pins the
  * structural invariants the caps promise — subset-of-verified,
  * output ≤ 2·K·n, star fallback on dense buckets — and (b) MEASURES
  * the recall trade on an ORGANIC corpus (content recombination, the
  * duplicate-heavy regime the caps exist for) and pins it above a
  * stated floor, so a regression in either direction (caps silently
  * loosened → cost creep, or tightened → recall collapse) fails at
  * dev time. The measured numbers are restated in PLANS.md next to
  * the exponent table.
  */
class DedupCappedSpec extends SparkTestBase {

  private val qs = SparkEntry.queries

  /** Organic ×3 recombination of sf0.01 (crossover docs + mixture
    * embeddings) — built once per suite, shared by the recall tests.
    */
  private lazy val organicDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_organic_spec")
      .toAbsolutePath.toString
    ScalePointBench.synthesizeOrganic(spark, "/root/testdata/sf0.01", d, 3)
    d
  }

  test("capped pairs are a subset of the uncapped verified pairs") {
    val capped = qs("dedup_pairs_capped")(spark, sfDir).localCheckpoint()
    val full = qs("dedup_ngram_jaccard")(spark, sfDir)
    assert(capped.count() > 0, "capped pair relation is empty — vacuous")
    // identical columns (doc_a, doc_b, n_inter, jaccard): a capped pair
    // must carry the exact verified values, not re-rounded ones
    assert(capped.exceptAll(full).count() == 0,
      "capped pairs contain rows absent from the uncapped verified relation")
  }

  test("dense buckets fall back to window edges and exact-dup clusters stay whole") {
    import spark.implicits._
    // 40 identical docs land in one band bucket per band (occupancy 40
    // > BucketCliqueCap) — the sorted-window lever MUST fire; distinct
    // fillers stay out of the cluster
    val dense = (1L to 40L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
    val fillers = (101L to 120L).map(i =>
      (i, s"filler$i uniq$i token$i other$i more$i"))
    val docs = (dense ++ fillers).toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccardOf(docs).localCheckpoint()
    assert(uncapped.filter(col("doc_a") <= 40 && col("doc_b") <= 40).count() == 40L * 39 / 2,
      "the uncapped build must enumerate the full 40-clique")
    val capped = Dedup.cappedPairsOf(docs).localCheckpoint()
    val denseCapped = capped.filter(col("doc_a") <= 40 && col("doc_b") <= 40)
    // exact-dup bucket: every window edge verifies at Jaccard 1.0, and
    // every (a, b) edge is ranked ≤ K by b (its predecessors are its
    // smallest-id neighbors), so the capped relation is exactly the
    // window graph: Σ min(n − i, w) edges — far below the 780-clique
    val w = Dedup.BucketWindow
    val expected = (1 to 39).map(i => math.min(40 - i, w)).sum
    assert(denseCapped.count() == expected,
      s"window fallback should emit $expected edges, got ${denseCapped.count()}")
    // the window path spans the same component as the clique: one
    // cluster of 40 labelled by the minimum member (star-contraction,
    // the engine path the capped queries run)
    val comps = Dedup.connectedComponentsStar(capped.select("doc_a", "doc_b"))
    assert(comps.filter(col("component") === 1).count() == 40,
      "the exact-dup cluster fragmented under the window fallback")
  }

  test("the degree cap bounds the capped pair output to <= 2*K*n") {
    val capped = qs("dedup_pairs_capped")(spark, organicDir).localCheckpoint()
    val n = capped.select(col("doc_a").as("d"))
      .union(capped.select(col("doc_b").as("d"))).distinct().count()
    val edges = capped.count()
    assert(edges <= 2L * Dedup.PairDegreeCap * n,
      s"capped output $edges edges exceeds 2*K*n = ${2L * Dedup.PairDegreeCap * n}")
  }

  test("merge recall vs uncapped components on the organic corpus") {
    val unc = Dedup.dedupComponents(spark, organicDir)
      .select("doc_id", "component").localCheckpoint()
    val cap = Dedup.dedupComponentsCapped(spark, organicDir)
      .select(col("doc_id"), col("component").as("ccomp")).localCheckpoint()
    // ground truth: every same-cluster doc pair under the uncapped
    // labelling; preserved: still same-cluster under the capped one
    val a = unc.select(col("doc_id").as("da"), col("component"))
    val b = unc.select(col("doc_id").as("db"), col("component"))
    val truth = a.join(b, "component").filter(col("da") < col("db"))
      .select("da", "db").localCheckpoint()
    val total = truth.count()
    assert(total > 0, "no uncapped same-component pairs — vacuous recall")
    val preserved = truth
      .join(cap.withColumnRenamed("doc_id", "da"), "da")
      .join(cap.select(col("doc_id").as("db"), col("ccomp").as("ccomp_b")), "db")
      .filter(col("ccomp") === col("ccomp_b"))
      .count()
    val recall = preserved.toDouble / total
    info(f"capped-dedup merge recall (organic x3 of sf0.01): $recall%.4f ($preserved/$total)")
    println(f"[capped-dedup] merge recall organic x3: $recall%.4f ($preserved/$total)")
    // measured 1.0000 at this point — every multi-member bucket is ≤
    // BucketCliqueCap at ×3, so the clique gate loses nothing; the
    // dense-bucket trade only appears at the ×10 point (PLANS.md).
    // Floor at 0.95: a regression in the candidate gate shows loudly
    assert(recall >= 0.95, f"merge recall $recall%.4f fell below the 0.95 floor")
  }

  test("capped admission probes dense buckets through the window and still drops exact dups") {
    import spark.implicits._
    // 40 identical docs → every band bucket has occupancy 40 >
    // BucketCliqueCap, so the ADMISSION window lever must fire. Every
    // new doc (doc_id % 4 == 0) has an old doc within 8 ranks (3 of
    // every 4 neighbors are old), so all 10 must still be dropped at
    // Jaccard 1.0 — the cap bounds probe width, not exact-dup recall.
    val dense = (1L to 40L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
    val fillers = (101L to 120L).map(i =>
      (i, s"filler$i uniq$i token$i other$i more$i"))
    val docs = (dense ++ fillers).toDF("doc_id", "text")
    val verdicts = Dedup.dedupIncrementalCappedOver(
      Dedup.bandKeysOf(docs), docs, col("doc_id") % 4 === 0)
      .localCheckpoint()
    val denseNew = verdicts.filter(col("doc_id") <= 40)
    assert(denseNew.count() == 10)
    assert(denseNew.filter(col("action") === "drop" &&
      col("match_jaccard") === 1.0).count() == 10,
      "a new exact-dup in a dense bucket escaped the capped admission window")
    // distinct fillers (small buckets, clique probe) must all be admitted
    assert(verdicts.filter(col("doc_id") > 100)
      .filter(col("action") =!= "admit").count() == 0)
  }

  test("capped admission drop-recall vs the uncapped probe on the organic corpus") {
    // of the docs the UNCAPPED probe drops, how many does the capped
    // probe still drop? (admits can only grow under the cap — a capped
    // probe sees a subset of candidates)
    val unc = qs("dedup_incremental")(spark, organicDir)
      .select(col("doc_id"), col("action").as("unc_action")).localCheckpoint()
    val cap = qs("dedup_incremental_capped")(spark, organicDir)
      .select(col("doc_id"), col("action").as("cap_action")).localCheckpoint()
    val joined = unc.join(cap, "doc_id").localCheckpoint()
    val dropped = joined.filter(col("unc_action") === "drop").count()
    assert(dropped > 0, "no uncapped drops — vacuous recall")
    val kept = joined.filter(col("unc_action") === "drop" &&
      col("cap_action") === "drop").count()
    // a capped probe can never drop what the uncapped probe admits
    assert(joined.filter(col("unc_action") === "admit" &&
      col("cap_action") === "drop").count() == 0,
      "capped probe dropped a doc the uncapped probe admits — candidates not a subset")
    val recall = kept.toDouble / dropped
    info(f"capped-admission drop recall (organic x3): $recall%.4f ($kept/$dropped)")
    println(f"[capped-dedup] admission drop recall organic x3: $recall%.4f ($kept/$dropped)")
    assert(recall >= 0.95, f"admission drop recall $recall%.4f below the 0.95 floor")
  }

  test("capped spans: containment, covered positions, and pair recall vs uncapped") {
    import graft.operators.TextAnalysis
    val docs = graft.Tables.documents(spark, organicDir)
      .select("doc_id", "text")
    val grams = TextAnalysis.spanGramsOver(docs).localCheckpoint()
    val unc = TextAnalysis.exactSpansOver(docs).localCheckpoint()
    val cap = TextAnalysis.cappedSpansFromGrams(grams).localCheckpoint()
    assert(cap.count() > 0, "capped span relation is empty — vacuous")
    // the LINEAR BOUND the capped twin exists for: hit mass ≤ w ·
    // eligible occurrences, counted, not asserted in prose
    val eligOcc = grams.select("g", "doc_id").distinct()
      .groupBy("g").agg(count(lit(1)).as("gdf"))
      .filter(col("gdf") >= 2 && col("gdf") <= 50)
      .agg(sum(col("gdf"))).head().getLong(0)
    val nHits = TextAnalysis.cappedSpanHitsOf(grams).count()
    assert(nHits <= TextAnalysis.SpanWindow.toLong * eligOcc,
      s"capped hit mass $nHits exceeds w*occurrences = ${TextAnalysis.SpanWindow.toLong * eligOcc}")
    // (a) CONTAINMENT: every capped span lies inside an uncapped span
    // of the same pair and diagonal (the cap can split or shorten
    // spans, never invent or extend them)
    val escaped = cap.alias("c").join(unc.alias("u"),
      col("c.doc_a") === col("u.doc_a") && col("c.doc_b") === col("u.doc_b") &&
        (col("c.start_a") - col("c.start_b")) === (col("u.start_a") - col("u.start_b")) &&
        col("c.start_a") >= col("u.start_a") &&
        col("c.start_a") + col("c.span_len") <= col("u.start_a") + col("u.span_len"),
      "left_anti").count()
    assert(escaped == 0, s"$escaped capped spans not contained in any uncapped span")
    // (b) COVERED POSITIONS: the set of (doc, pos) gram positions
    // inside a cross-doc span is IDENTICAL — in every gram's
    // occurrence list each member still pairs with an adjacent member,
    // so the cap changes pair attribution, never position coverage
    def covered(spans: org.apache.spark.sql.DataFrame) = spans
      .select(col("doc_a").as("doc_id"), explode(sequence(col("start_a"),
        col("start_a") + col("span_len") - TextAnalysis.SpanGram)).as("pos"))
      .union(spans.select(col("doc_b").as("doc_id"),
        explode(sequence(col("start_b"),
          col("start_b") + col("span_len") - TextAnalysis.SpanGram)).as("pos")))
      .distinct()
    val uncCov = covered(unc).localCheckpoint()
    val capCov = covered(cap).localCheckpoint()
    assert(uncCov.exceptAll(capCov).count() == 0 &&
      capCov.exceptAll(uncCov).count() == 0,
      "covered-position sets differ between capped and uncapped span search")
    // (c) PAIR RECALL: fraction of uncapped span pairs still reported
    val uncPairs = unc.select("doc_a", "doc_b").distinct().localCheckpoint()
    val total = uncPairs.count()
    val kept = uncPairs.join(cap.select("doc_a", "doc_b").distinct(),
      Seq("doc_a", "doc_b"), "left_semi").count()
    val recall = kept.toDouble / total
    info(f"capped-span pair recall (organic x3): $recall%.4f ($kept/$total)")
    println(f"[capped-dedup] span pair recall organic x3: $recall%.4f ($kept/$total)")
    // measured 0.92 at this point with w = 2 (DuckDB sweep, PLANS.md);
    // the floor sits under the measured value to catch a window
    // regression, not noise
    assert(recall >= 0.85, f"span pair recall $recall%.4f below the 0.85 floor")
  }

  test("capped phash pairs: dense identical-fingerprint runs stay windowed, subset holds") {
    import graft.operators.Multimodal
    import spark.implicits._
    // 40 identical fingerprints → every fine band's bucket has
    // occupancy ≥ 40 > DctCliqueCap, so the sorted-window lever MUST
    // fire; sorted by (phash64, doc_id) the run is contiguous, so the
    // within-run pairs are exactly each member × its next w run
    // successors. Fillers are spread 64-bit values (pairwise hamming
    // ~32) — they collide into some buckets but never pass radius 10.
    val run = (1L to 40L).map(i => (i, "image", 0L))
    val fillers = (101L to 120L).map(i =>
      (i, "image", i * 2862933555777941757L + 3037000493L))
    val fp = (run ++ fillers).toDF("doc_id", "modality", "phash64")
    val capped = Multimodal.cappedDctPairsOver(fp).localCheckpoint()
    val uncapped = Multimodal.dctPairsOver(fp).localCheckpoint()
    assert(capped.exceptAll(uncapped).count() == 0,
      "capped phash pairs contain rows absent from the uncapped fine search")
    val w = Multimodal.DctWindow
    val runCapped = capped.filter(col("doc_a") <= 40 && col("doc_b") <= 40)
    val expected = (1 to 39).map(i => math.min(40 - i, w)).sum
    assert(runCapped.count() == expected,
      s"window fallback should emit $expected run pairs, got ${runCapped.count()}")
    assert(uncapped.filter(col("doc_a") <= 40 && col("doc_b") <= 40).count() == 40L * 39 / 2,
      "the uncapped fine search must enumerate the full 40-clique")
    // every emitted pair carries its exact hamming (0 within the run)
    assert(runCapped.filter(col("hamming") =!= 0).count() == 0)
  }

  test("capped phash pair recall vs uncapped on the organic corpus") {
    val unc = qs("multimodal_phash_dct_pairs")(spark, organicDir)
      .select("modality", "doc_a", "doc_b").localCheckpoint()
    val cap = qs("multimodal_phash_dct_pairs_capped")(spark, organicDir)
      .select("modality", "doc_a", "doc_b")
    val total = unc.count()
    assert(total > 0, "no uncapped phash pairs — vacuous recall")
    val kept = unc.join(cap, Seq("modality", "doc_a", "doc_b"), "left_semi").count()
    val recall = kept.toDouble / total
    info(f"capped-phash pair recall (organic x3): $recall%.4f ($kept/$total)")
    println(f"[capped-dedup] phash pair recall organic x3: $recall%.4f ($kept/$total)")
    // at ×3 fine-band occupancy is still mostly under the gate, so the
    // clique path dominates; the floor catches a gate/window regression
    assert(recall >= 0.85, f"phash pair recall $recall%.4f below the 0.85 floor")
  }

  test("capped fusion recall@5 vs uncapped, sf0.1 and organic") {
    // VERDICT r14 item 2: the caps' COST is measured (PLANS.md
    // exponents) — this measures what they do to the ANSWER. Uncapped
    // top-5 is ground truth; recall@5 = fraction surviving in the
    // capped top-5.
    def recallAt(dir: String): (Long, Long) = {
      val unc = qs("ann_rrf_fusion")(spark, dir)
        .select("q_id", "neighbor_id").localCheckpoint()
      val cap = qs("ann_rrf_fusion_capped")(spark, dir)
        .select("q_id", "neighbor_id")
      (cap.join(unc, Seq("q_id", "neighbor_id"), "left_semi").count(), unc.count())
    }
    val (h1, t1) = recallAt("/root/testdata/sf0.1")
    val r1 = h1.toDouble / t1
    info(f"capped-fusion recall@5 sf0.1: $r1%.4f ($h1/$t1)")
    println(f"[capped-fusion] recall@5 sf0.1: $r1%.4f ($h1/$t1)")
    val (hN, tN) = recallAt(organicDir)
    val rN = hN.toDouble / tN
    info(f"capped-fusion recall@5 organic x3: $rN%.4f ($hN/$tN)")
    println(f"[capped-fusion] recall@5 organic x3: $rN%.4f ($hN/$tN)")
    assert(t1 > 0 && tN > 0)
    // measured 0.92 at sf0.1 / ~1.0 at the ×3 point with the
    // truncation + champion-list + exact-rescore leg (truncation-only
    // scored 0.20 — partial sums on a 31-type vocabulary; see
    // AnnSearch.RrfChampCap). Floors sit under the measured values to
    // catch a cap regression, not noise
    assert(r1 >= 0.85, f"sf0.1 recall@5 $r1%.4f below the 0.85 floor")
    assert(rN >= 0.85, f"organic recall@5 $rN%.4f below the 0.85 floor")
  }
}

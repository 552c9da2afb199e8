package graft

import graft.operators._
import org.apache.spark.sql.functions._

class EtlOperatorsSpec extends SparkTestBase {

  test("all ETL queries return rows") {
    val all = EtlCleaning.queries ++ EtlMatching.queries ++
      EtlEnrichment.queries ++ EtlTemplates.queries
    all.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name returned no rows")
    }
  }

  test("fillna leaves no nulls and zeroes the gaps") {
    val df = EtlCleaning.fillnaZero(spark, sfDir)
    assert(df.filter(col("quantity").isNull).count() == 0)
    assert(df.filter(col("quantity") === 0.0).count() > 0)
  }

  test("menu clean applies defaults and parses prices") {
    val df = EtlCleaning.menuClean(spark, sfDir)
    assert(df.filter(col("subcategory").isNull || col("description").isNull).count() == 0)
    assert(df.filter(col("subcategory") === "General").count() > 0)
    assert(df.filter(col("description").startsWith("Delicious ")).count() > 0)
    // parsed price round-trips the original retail price exactly
    val joined = df.join(Tables.part(spark, sfDir), Seq("p_partkey"))
    assert(joined.filter(col("price") =!= col("p_retailprice")).count() == 0)
  }

  test("column map drops empty product names") {
    val df = EtlCleaning.columnMapRestaurant(spark, sfDir)
    assert(df.filter(col("product_name") === "").count() == 0)
    assert(df.count() < Tables.part(spark, sfDir).count())
  }

  test("dedup keeps exactly one row per (name, price) and keeps the first") {
    val df = EtlCleaning.dedupFirst(spark, sfDir)
    assert(df.groupBy("p_name", "p_retailprice").count().filter(col("count") > 1).count() == 0)
    val firstKeys = Tables.part(spark, sfDir)
      .groupBy("p_name", "p_retailprice").agg(min("p_partkey").as("k"))
    assert(df.join(firstKeys, df("p_partkey") === firstKeys("k"), "left_anti").count() == 0)
  }

  test("batch assign produces dense batches of 10") {
    val df = EtlCleaning.batchAssign(spark, sfDir)
    val sizes = df.groupBy("batch_id").count()
    assert(sizes.filter(col("count") > 10).count() == 0)
    assert(sizes.filter(col("count") =!= 10).count() <= 1) // only the tail batch
  }

  test("upc validation accepts only correct check digits") {
    val df = EtlMatching.upcValidate(spark, sfDir)
    val valid = df.filter(col("upc_is_valid"))
    assert(valid.count() > 0)
    assert(valid.filter(length(col("upc")) =!= 12).count() == 0)
    // ~1 in 10 codes should validate (check digit uniform-ish)
    val rate = valid.count().toDouble / df.count()
    assert(rate > 0.02 && rate < 0.3, s"suspicious validity rate $rate")
  }

  test("upc match enriches with master attributes") {
    val df = EtlMatching.upcMatch(spark, sfDir)
    assert(df.filter(col("master_name").isNull).count() == 0)
    assert(df.select("match_type").distinct().collect().map(_.getString(0)).toSeq == Seq("upc"))
  }

  test("similarity match is top-1 per product within threshold") {
    val df = EtlMatching.similarityMatch(spark, sfDir)
    assert(df.groupBy("p_partkey").count().filter(col("count") > 1).count() == 0)
    assert(df.filter(col("distance") > 6).count() == 0)
  }

  test("similarity length-band blocking is result-invisible vs the pure prefix block") {
    // reference result: prefix block only (the oracle's declarative spec)
    val p = Tables.part(spark, sfDir)
    val masters = p.filter(col("p_type") === "PROMO")
      .groupBy(col("p_name").as("master_name"))
      .agg(min(col("p_partkey")).as("master_id"))
      .withColumn("block", substring(col("master_name"), 1, 1))
    val cands = p.filter(col("p_type") =!= "PROMO")
      .select(col("p_partkey"), col("p_name").as("product_name"),
        substring(col("p_name"), 1, 1).as("block"))
    val reference = cands.join(masters, Seq("block"))
      .withColumn("distance", levenshtein(col("product_name"), col("master_name")))
      .filter(col("distance") <= 6)
      .select("p_partkey", "master_id", "distance")
    val banded = EtlMatching.similarityMatch(spark, sfDir)
    // the banded operator keeps top-1; every reference pair within
    // threshold must have been a candidate, so the banded top-1 equals
    // the reference top-1 computed independently
    val refTop = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("p_partkey"))
        .orderBy(col("distance"), col("mn"), col("master_id"))
      cands.join(masters.withColumnRenamed("master_name", "mn"), Seq("block"))
        .withColumn("distance", levenshtein(col("product_name"), col("mn")))
        .filter(col("distance") <= 6)
        .withColumn("rnk", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rnk") === 1)
        .select(col("p_partkey"), col("master_id"), col("mn").as("master_name"), col("distance"))
    }
    assert(banded.select("p_partkey", "master_id", "master_name", "distance")
      .exceptAll(refTop).count() == 0)
    assert(refTop.exceptAll(
      banded.select("p_partkey", "master_id", "master_name", "distance")).count() == 0)
  }

  test("accent folding makes accent-variant names block together") {
    // Without folding, the mutated feed's equality join finds only the
    // rows that were left clean; the folded join recovers the accented
    // two-thirds as well.
    val p = Tables.part(spark, sfDir)
    val masters = p.filter(col("p_type") === "PROMO")
      .select(col("p_name").as("master_name")).distinct()
    val mutated = p.filter(col("p_type") =!= "PROMO")
      .select(col("p_partkey"),
        when(col("p_partkey") % 3 === 0, translate(col("p_name"), "aeiou", "àéîöú"))
          .when(col("p_partkey") % 3 === 1, translate(upper(col("p_name")), "AEIOU", "ÀÉÎÖÚ"))
          .otherwise(col("p_name")).as("name_src"))
    val unfoldedHits = mutated
      .join(masters, col("name_src") === col("master_name")).count()
    val df = EtlMatching.accentFoldMatch(spark, sfDir)
    assert(df.count() > unfoldedHits,
      "folding must recover matches plain equality misses")
    assert(df.filter(col("needed_fold")).count() > 0)
    // the folded key is accent- and case-free
    assert(df.filter(col("name_folded").rlike("[^a-z0-9 ]")).count() == 0)
    // folding is canonical: folded names joined a master whose own fold
    // equals them
    assert(df.filter(
      EtlMatching.foldAccents(col("master_name")) =!= col("name_folded"))
      .count() == 0)
  }

  test("content defaults fill every taxonomy field") {
    val df = EtlEnrichment.contentDefaults(spark, sfDir)
    Seq("brand_name", "category_name", "subcategory_name", "description").foreach { c =>
      assert(df.filter(col(c).isNull).count() == 0, s"$c has nulls")
    }
    assert(df.filter(col("match_type") === "generated").count() > 0)
    assert(df.filter(!col("is_complete") && col("match_type") === "mapped").count() == 0)
  }

  test("embeddings are deterministic and in [0,1)") {
    val a = EtlEnrichment.embedProducts(spark, sfDir).collect()
    val b = EtlEnrichment.embedProducts(spark, sfDir).collect()
    assert(a.sameElements(b))
    val df = EtlEnrichment.embedProducts(spark, sfDir)
    (0 until 8).foreach { i =>
      assert(df.filter(col(s"e$i") < 0 || col(s"e$i") >= 1).count() == 0)
    }
  }

  test("master products only carry UPC for grocery rows") {
    val df = EtlEnrichment.masterProducts(spark, sfDir)
    val restaurantKeys = EtlEnrichment.contentDefaults(spark, sfDir)
      .filter(col("is_restaurant")).select("p_partkey")
    assert(df.join(restaurantKeys, Seq("p_partkey")).filter(col("upc").isNotNull).count() == 0)
    assert(df.filter(col("upc").isNotNull).count() > 0)
  }

  test("es docs prefer master id over retailer id") {
    val df = EtlEnrichment.esDocs(spark, sfDir)
    assert(df.filter(col("doc_id").startsWith("m-")).count() > 0)
    assert(df.filter(col("doc_id").startsWith("r-")).count() > 0)
    assert(df.filter(col("doc_id").isNull).count() == 0)
  }

  test("apply updates: overlay wins on updated rows, carry-forward elsewhere") {
    val catalog = EtlCleaning.menuClean(spark, sfDir)
      .select(col("p_partkey"), col("price").as("old_price"), col("description").as("old_desc"))
    val df = EtlEnrichment.applyUpdates(spark, sfDir).join(catalog, "p_partkey").cache()
    assert(df.count() == catalog.count())
    val updated = df.filter(col("was_updated"))
    assert(updated.count() > 0)
    assert(updated.filter(col("price") =!= col("old_price") + 5.0).count() == 0)
    assert(updated.filter(!col("description").startsWith("Updated ")).count() == 0)
    val untouched = df.filter(!col("was_updated"))
    assert(untouched.filter(col("price") =!= col("old_price") ||
      col("description") =!= col("old_desc")).count() == 0)
  }

  test("price outliers: z-scores standardized per category, outliers beyond 2 sigma") {
    val df = graft.operators.EtlCleaning.priceOutliers(spark, sfDir).cache()
    assert(df.count() == Tables.part(spark, sfDir).count())
    assert(df.filter(col("is_outlier") && abs(col("z")) <= 2).count() == 0)
    // per-category mean of z is ~0
    val badCat = df.groupBy("p_type").agg(avg("z").as("mz"))
      .filter(abs(col("mz")) > 1e-3)
    assert(badCat.count() == 0)
  }

  test("template sections carry exactly product_count ordered retailer ids") {
    val df = graft.operators.EtlTemplates.templateSections(spark, sfDir).cache()
    val bad = df.filter(
      size(split(col("product_retailer_ids"), ",")) =!= col("product_count"))
    assert(bad.count() == 0)
    assert(df.filter(col("product_count") > 30).count() == 0)
  }

  test("template chunks never exceed 30 products") {
    val df = EtlTemplates.templateGroups(spark, sfDir)
    assert(df.filter(col("product_count") > 30).count() == 0)
    // multi-chunk categories get numbered names
    val multi = df.groupBy("category").count().filter(col("count") > 1).select("category")
    val numbered = df.join(multi, Seq("category"))
      .filter(!col("template_name").rlike(" \\d+$"))
    assert(numbered.count() == 0)
  }

  test("header text uses dictionary for known categories, fallback otherwise") {
    val df = EtlTemplates.headerText(spark, sfDir)
    val known = df.filter(col("category") === "Desserts").head()
    assert(known.getAs[String]("header_text") == "Sweet Treats to End Your Day!")
    val fallback = df.filter(col("category") === "ECONOMY").head()
    assert(fallback.getAs[String]("header_text") == "Explore Our ECONOMY!")
  }

  test("etl_temporal_join: versions tile — every lineitem lands in exactly one version window") {
    val df = EtlEnrichment.temporalJoin(spark, sfDir).cache()
    // total line coverage: every lineitem row is attributed exactly once
    val total = df.agg(sum(col("n_lines"))).head().getLong(0)
    assert(total == graft.Tables.lineitem(spark, sfDir).count(),
      "temporal join lost or duplicated fact rows — version windows don't tile")
    // ship spans sit inside the version window (re-join the history)
    val v = EtlEnrichment.scd2History(spark, sfDir)
      .select(col("l_partkey"), col("version"), col("valid_from"), col("valid_to"))
    val joined = df.join(v, Seq("l_partkey", "version"))
    assert(joined.filter(col("first_ship") < col("valid_from")).count() == 0)
    assert(joined.filter(col("valid_to").isNotNull &&
      col("last_ship") >= col("valid_to")).count() == 0)
    df.unpersist()
  }

  test("etl_cdc_apply: delete-terminated keys absent, survivors carry their true latest op") {
    val df = EtlCleaning.cdcApply(spark, sfDir).cache()
    assert(df.count() > 0)
    assert(df.groupBy("key").count().filter(col("count") > 1).count() == 0)
    // re-derive the log and check one invariant both ways: a key is
    // ABSENT iff its max-seq change is a delete
    val ch = graft.Tables.orders(spark, sfDir).select(
      col("o_custkey").as("key"), col("o_orderkey").as("seq"),
      when(col("o_orderkey") % 10 === 0, "D")
        .when(col("o_orderkey") % 10 <= 3, "U").otherwise("I").as("op"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("seq").desc)
    val last = ch.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val deleted = last.filter(col("op") === "D").select("key")
    val kept = last.filter(col("op") =!= "D").select(col("key"), col("op").as("true_op"))
    assert(df.join(deleted, "key").count() == 0, "a delete-terminated key survived")
    assert(kept.join(df, "key").filter(col("last_op") =!= col("true_op")).count() == 0)
    assert(df.count() == kept.count())
    df.unpersist()
  }

  test("dq_bloom_fpr: the audit's own numbers are internally consistent") {
    val r = DataQuality.dqBloomFpr(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    val (nIns, nNeg, fp) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val (rate, theo) = (row.getDouble(3), row.getDouble(4))
    assert(nIns > 0 && nNeg > 0)
    assert(fp >= 0 && fp <= nNeg)
    assert(math.abs(rate - fp.toDouble / nNeg) < 1e-6)
    assert(theo > 0 && theo < 1)
    // empirical FPR concentrates near the theoretical bound: allow a
    // generous band (small negative populations at tiny SFs)
    assert(rate <= theo * 5 + 0.02, f"fp rate $rate%.4f vs theoretical $theo%.4f")
  }

  test("dq_checks: fifteen constraints, pass flags consistent, driver data is clean") {
    val df = DataQuality.dqChecks(spark, sfDir).cache()
    assert(df.count() == 15)
    assert(df.filter(col("pass") =!= (col("n_violations") === 0)).count() == 0)
    // the generated tables satisfy every declared constraint — the
    // pipeline's own outputs meet the reference model contract
    assert(df.filter(!col("pass")).count() == 0)
    // counted over the full tables, not a sample
    val nPart = Tables.part(spark, sfDir).count()
    assert(df.filter(col("target").startsWith("part.") && col("n_rows") =!= nPart)
      .count() == 0)
    df.unpersist()
  }

  test("model-contract rows fire on violating input (product_models.py per-field constraints)") {
    import spark.implicits._
    // one violation per MDBProduct field + each content/tax constraint
    val badArticles = Seq(
      ("123", "ok name", 1.0, 1.0),        // article_id not 12 digits
      ("123456789012", "  ", 1.0, 1.0),    // blank name
      ("123456789012", "ok", -5.0, 1.0),   // negative price
      ("123456789012", "ok", 1.0, -2.0))   // negative quantity
      .toDF("article_id", "product_name", "price", "quantity")
    val badContent = Seq(
      (null.asInstanceOf[String], "d", "s", "mapped"),   // null brand
      ("b", "", "s", "generated"),                       // empty description
      ("b", "d", null.asInstanceOf[String], "mapped"),   // null subcategory
      ("b", "d", "s", "upc"))                            // match_type outside domain
      .toDF("brand_name", "description", "subcategory_name", "match_type")
    val badSlab = Seq((true, "TAX_SLAB_FALSE"), (false, "TAX_SLAB_FALSE"))
      .toDF("is_tax", "tax_slab")
    val r = DataQuality.modelChecks(badArticles, badContent, badSlab)
      .select(col("r.constraint_name"), col("r.n_violations")).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.size == 9)
    // every constraint sees EXACTLY its one planted violation
    r.foreach { case (name, v) => assert(v == 1L, s"$name counted $v") }
  }

  test("quarantine: every reason fires, verdict matches the reason list") {
    val df = EtlCleaning.quarantine(spark, sfDir).cache()
    assert(df.filter(col("is_quarantined") =!= (col("reasons") =!= "")).count() == 0)
    Seq("missing_name", "bad_price", "negative_quantity").foreach { r =>
      assert(df.filter(col("reasons").contains(r)).count() > 0, s"$r never fired")
    }
    assert(df.filter(!col("is_quarantined")).count() > 0)
    // reason implies the offending value is actually bad
    assert(df.filter(col("reasons").contains("missing_name")
      && col("name").isNotNull).count() == 0)
    assert(df.filter(col("reasons").contains("negative_quantity")
      && col("quantity") >= 0).count() == 0)
    assert(df.filter(col("reasons").contains("bad_price")
      && col("price") > 0).count() == 0)
    df.unpersist()
  }


  test("match waterfall: one planted product resolves through each branch") {
    import spark.implicits._
    // masters: M1 has a valid UPC; M2 is name-only (no upc)
    val masters = Seq(
      (100L, "almond latte syrup", Some("036000291452")),
      (200L, "blueberry scone mix", None))
      .toDF("master_id", "master_name", "master_upc")
    // four incoming articles, one per decision path:
    //  1 — valid UPC that HITS M1            => upc (score null)
    //  2 — no UPC, name 1 edit from M2       => similarity, score 1
    //  3 — no UPC, name exactly M2           => similarity, score 0
    //  4 — no UPC, name far from everything  => no_match
    val incoming = Seq(
      (1L, "whatever name here", Some("036000291452")),
      (2L, "blueberry scone mixx", None),
      (3L, "blueberry scone mix", None),
      (4L, "zzzzzz qqqqqq kkkkkk", None))
      .toDF("p_partkey", "product_name", "upc")
    val out = EtlMatching.waterfallOver(incoming, masters).collect()
      .map(r => r.getLong(0) -> ((r.getString(4),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Int])))).toMap
    assert(out.size == 4, s"every article resolves exactly once: $out")
    assert(out(1L) == (("upc", Some(100L), None)), s"upc branch: ${out(1L)}")
    assert(out(2L) == (("similarity", Some(200L), Some(1))), s"sim branch: ${out(2L)}")
    assert(out(3L) == (("similarity", Some(200L), Some(0))), s"sim-exact branch: ${out(3L)}")
    assert(out(4L) == (("no_match", None, None)), s"no_match branch: ${out(4L)}")
    // corpus invariants: provenance is total and consistent
    val corpus = EtlMatching.matchWaterfall(spark, sfDir).cache()
    assert(corpus.select("p_partkey").distinct().count() == corpus.count(),
      "one decision per incoming article")
    assert(corpus.filter(col("match_type") === "upc" && col("master_id").isNull).count() == 0)
    assert(corpus.filter(col("match_type") === "similarity" &&
      (col("score").isNull || col("score") > 2)).count() == 0)
    assert(corpus.filter(col("match_type") === "no_match" &&
      col("master_id").isNotNull).count() == 0)
    corpus.unpersist()
  }


  test("skew report: totals reconcile, the known hot key is diagnosed, salting is justified") {
    val rep = DataQuality.dqSkewReport(spark, sfDir).cache()
    assert(rep.count() == 3)
    val li = Tables.lineitem(spark, sfDir)
    val n = li.count()
    // every key column sees all rows; avg = rows/keys; shares in (0,1]
    rep.collect().foreach { r =>
      assert(r.getLong(1) == n, s"n_rows mismatch for ${r.getString(0)}")
      assert(r.getDouble(6) > 0 && r.getDouble(6) <= 1.0)
      assert(r.getDouble(5) >= 1.0, "skew_ratio < 1 is impossible")
      assert(r.getLong(3) >= scala.math.ceil(n.toDouble / r.getLong(2)).toLong,
        "max_per_key below the pigeonhole floor")
    }
    // cross-check one column against a direct count
    val supp = rep.filter(col("key_name") === "l_suppkey").head()
    val direct = li.groupBy("l_suppkey").count()
      .agg(count(lit(1)), max("count")).head()
    assert(supp.getLong(2) == direct.getLong(0) && supp.getLong(3) == direct.getLong(1))
    rep.unpersist()
  }

}

package graft

import graft.functions.UpcValid
import graft.operators.EtlMatching
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class ExtensionsSpec extends SparkTestBase {

  test("upc_valid expression: known-good and known-bad codes, eval and codegen paths agree") {
    import spark.implicits._
    val cases = Seq(
      ("036000291452", true),   // classic valid UPC-A
      ("036000291453", false),  // wrong check digit
      ("03600029145", false),   // 11 digits
      ("0360002914521", false), // 13 digits
      ("03600029145x", false),  // non-digit
      ("000000000000", true))   // all zeros: sum 0 % 10 == 0

    // interpreted twin
    cases.foreach { case (code, want) =>
      assert(UpcValid.check(UTF8String.fromString(code)) == want, s"check($code)")
    }
    // through the session-registered SQL function (whole-stage codegen)
    val got = cases.map(_._1).toDF("code")
      .select(col("code"), call_function("upc_valid", col("code")).as("valid"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (code, want) => assert(got(code) == want, s"sql($code)") }
    // null in → null out
    val nullRow = Seq[Option[String]](None).toDF("code")
      .select(call_function("upc_valid", col("code"))).head()
    assert(nullRow.isNullAt(0))
  }

  test("upc_valid property: appending the computed check digit always validates") {
    import spark.implicits._
    // for any 11-digit prefix, the UPC-A check digit makes it valid and
    // every other digit makes it invalid
    val prefixes = (0 until 500).map(i => f"${i * 987654321L % 100000000000L}%011d")
    def checkDigit(p: String): Int = {
      val ds = p.map(_ - '0')
      val s = 3 * Seq(0, 2, 4, 6, 8, 10).map(ds).sum + Seq(1, 3, 5, 7, 9).map(ds).sum
      (10 - s % 10) % 10
    }
    val rows = prefixes.flatMap { p =>
      val good = checkDigit(p)
      (0 to 9).map(d => (p + d, d == good))
    }
    val df = rows.toDF("code", "want")
      .withColumn("got", call_function("upc_valid", col("code")))
    assert(df.filter(col("got") =!= col("want")).count() == 0)
  }

  test("upc_valid agrees with the column-expression validator across the whole part table") {
    val df = EtlMatching.upcValidate(spark, sfDir)
    // upc is set iff upc_is_valid; upc always passes the native check
    assert(df.filter(col("upc_is_valid") =!= col("upc").isNotNull).count() == 0)
    val recheck = df.filter(col("upc").isNotNull)
      .filter(!call_function("upc_valid", col("upc")))
    assert(recheck.count() == 0)
  }

  test("vec_dot native expression agrees with the higher-order-function fold") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(100)
    val hof = aggregate(zip_with(col("v"), col("v"), (u, w) => u * w),
      lit(0.0), (acc, x) => acc + x)
    // bit-identical, not just close: same left-to-right summation order
    val diff = e.select(call_function("vec_dot", col("v"), col("v")).as("native"), hof.as("fold"))
      .filter(col("native") =!= col("fold"))
    assert(diff.count() == 0)
    // null array and null element both yield null (fold semantics)
    val edge = Seq(
      (Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(3.0), Some(4.0)))),
      (None, Some(Seq(Some(1.0)))),
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(1.0), Some(1.0)))))
      .toDF("a", "b")
      .select(call_function("vec_dot", col("a"), col("b")).as("d"))
      .collect()
    assert(edge(0).getDouble(0) == 11.0)
    assert(edge(1).isNullAt(0) && edge(2).isNullAt(0))
    // unequal lengths: zip_with pads with nulls, so the fold is null —
    // and vec_dot matches (not an overlap sum)
    val uneq = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
      .select(call_function("vec_dot", col("a"), col("b")).as("d"))
      .collect()
    assert(uneq(0).isNullAt(0))
    // callable from SQL through the same registry
    assert(spark.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .head().getDouble(0) == 11.0)
  }

  test("SQL surface: text queries run through the same session, upc_valid callable from SQL") {
    val rev = graft.operators.SqlSurface.revenueByNation(spark, sfDir)
    assert(rev.count() > 0 && rev.count() <= 25) // at most one row per nation
    val share = graft.operators.SqlSurface.upcValidShare(spark, sfDir).cache()
    assert(share.filter(col("n_valid") > col("n_parts")).count() == 0)
    val totals = share.agg(sum("n_parts")).head().getLong(0)
    assert(totals == Tables.part(spark, sfDir).count())
  }

  test("bloom_agg / bloom_contains callable from SQL: members hit, probability math holds") {
    import spark.implicits._
    (1L to 1000L).toDF("k").createOrReplaceTempView("bloom_members")
    // every inserted key must hit (no false negatives - the bloom
    // contract), and non-members mostly miss at these capacities
    val hits = spark.sql(
      """SELECT count(*) AS n FROM bloom_members
        |WHERE bloom_contains(
        |  (SELECT bloom_agg(xxhash64(k), 2000L) FROM bloom_members),
        |  xxhash64(k))""".stripMargin).head().getLong(0)
    assert(hits == 1000L, s"false negatives: only $hits of 1000 members hit")
    val fp = spark.sql(
      """SELECT count(*) AS n FROM (SELECT id + 5000 AS k FROM range(10000))
        |WHERE bloom_contains(
        |  (SELECT bloom_agg(xxhash64(k), 2000L) FROM bloom_members),
        |  xxhash64(k))""".stripMargin).head().getLong(0)
    assert(fp < 500, s"false-positive rate implausibly high: $fp / 10000")
    spark.catalog.dropTempView("bloom_members")
  }

  test("levenshtein prefilter rule rewrites the similarity-match plan to the banded form") {
    val plan = EtlMatching.similarityMatch(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    // the rewrite leaves a threshold-ed (banded) levenshtein + length guard
    assert(plan.contains("Some(6)"), s"banded levenshtein missing from plan:\n$plan")
    assert(plan.contains("abs("), s"length-difference guard missing from plan:\n$plan")
  }

  test("levenshtein prefilter leaves degenerate thresholds untouched") {
    // parquet-backed so constant folding can't collapse the plan away
    val p = Tables.part(spark, sfDir)
    // k < 0 (<=) and k <= 0 (<): constant-false predicates must not be
    // rewritten into a negative-threshold banded levenshtein
    val le = p.filter(levenshtein(col("p_name"), col("p_brand")) <= -1)
    assert(le.count() == 0)
    assert(!le.queryExecution.optimizedPlan.toString.contains("Some(-1)"))
    val lt = p.filter(levenshtein(col("p_name"), col("p_brand")) < 0)
    assert(lt.count() == 0)
    assert(!lt.queryExecution.optimizedPlan.toString.contains("Some(-1)"))
    // strict < with a positive literal still rewrites (k-1 band)
    val ok = p.filter(levenshtein(col("p_name"), col("p_name")) < 1)
    assert(ok.count() == p.count())
    assert(ok.queryExecution.optimizedPlan.toString.contains("Some(0)"))
  }

  test("levenshtein prefilter preserves results (reference filter computed without the rule shape)") {
    import spark.implicits._
    val pairs = Seq(
      ("kitten", "sitting"),   // distance 3
      ("flaw", "lawn"),        // distance 2
      ("abcdef", "abcdefghij") // length diff 4 > 3 → pruned by guard
    ).toDF("a", "b")
    val viaRule = pairs.filter(levenshtein(col("a"), col("b")) <= 3).collect().map(r => (r.getString(0), r.getString(1)))
    assert(viaRule.toSet == Set(("kitten", "sitting"), ("flaw", "lawn")))
  }

  test("sq8 round0 equals Spark round(x, 0) semantics on boundaries and random doubles") {
    import graft.functions.Sq8
    def ref(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
    val boundaries = Seq(
      0.0, 0.5, 1.5, 2.5, -0.5, -1.5, -2.5,
      0.49999999999999994, -0.49999999999999994,
      0.9999999999999999, 1.0000000000000002,
      2251799813685247.5, -2251799813685247.5, // largest .5-representable zone
      4503599627370495.5, 9.007199254740992e15, // 2^53: all-integer regime
      1.23456789012345e17, -1.23456789012345e17,
      1e-300, -1e-300, 255.49999999999997, 254.50000000000003)
    boundaries.foreach { x =>
      assert(Sq8.round0(x) == ref(x), s"round0($x): ${Sq8.round0(x)} vs ${ref(x)}")
    }
    val rnd = new scala.util.Random(42)
    (1 to 200000).foreach { _ =>
      // mix of magnitudes: uniform fractions, scaled, and near-.5 ties
      val x = rnd.nextInt(4) match {
        case 0 => rnd.nextDouble() * 1000 - 500
        case 1 => rnd.nextDouble() * 1e12 - 5e11
        case 2 => rnd.nextInt(2000) - 1000 + 0.5
        case _ => java.lang.Double.longBitsToDouble(rnd.nextLong()) match {
          case d if d.isNaN || d.isInfinite => 0.25
          case d => d
        }
      }
      assert(Sq8.round0(x) == ref(x), s"round0($x) diverges from BigDecimal")
    }
  }

  test("sq8_enc / sq8_dist agree with the composed per-dimension SQL formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dims = 16
    val vecs = (0L until 40L).map(i =>
      (i, Seq.fill(dims)(rnd.nextDouble() * 2 - 1)))
      .toDF("vec_id", "v")
    vecs.createOrReplaceTempView("sq8_vecs")
    // per-dim range model folded to arrays, exactly as annSq8Topk does
    val model = spark.sql(
      """SELECT
        |  transform(array_sort(collect_list(struct(d, lo))), s -> s.lo) AS lo_arr,
        |  transform(array_sort(collect_list(struct(d, hi))), s -> s.hi) AS hi_arr
        |FROM (
        |  SELECT d, round(min(x), 6) AS lo, round(max(x), 6) AS hi
        |  FROM (SELECT posexplode(v) AS (d, x) FROM sq8_vecs) GROUP BY d)""".stripMargin)
    val withModel = vecs.crossJoin(broadcast(model))
    val enc = withModel.select(col("vec_id"),
      call_function("sq8_enc", col("v"), col("lo_arr"), col("hi_arr")).as("codes"),
      col("v"), col("lo_arr"), col("hi_arr"))
    // composed reference: explode, round per element — Spark's own round
    val refCodes = withModel
      .select(col("vec_id"), col("lo_arr"), col("hi_arr"), posexplode(col("v")).as(Seq("d", "x")))
      .withColumn("lo", expr("lo_arr[d]")).withColumn("hi", expr("hi_arr[d]"))
      .withColumn("code", when(col("hi") === col("lo"), 0)
        .otherwise(round((col("x") - col("lo")) / (col("hi") - col("lo")) * 255, 0).cast("int")))
      .groupBy("vec_id")
      .agg(expr("transform(array_sort(collect_list(struct(d, code))), s -> s.code)").as("ref_codes"))
    assert(enc.join(refCodes, "vec_id")
      .filter(col("codes") =!= col("ref_codes")).count() == 0,
      "sq8_enc disagrees with the composed encode")
    // distance: native vs composed integer-scaled term sum
    val q = enc.select(col("vec_id").as("q_id"), col("v").as("qv"))
    val nat = enc.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        call_function("sq8_dist", col("qv"), col("codes"),
          col("lo_arr"), col("hi_arr")).as("t6"))
    val refT = enc.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("lo_arr"), col("hi_arr"),
        posexplode(arrays_zip(col("qv"), col("codes"))).as(Seq("d", "z")))
      // 255.0D: an un-suffixed SQL literal 255.0 is DECIMAL(4,1) and
      // drags the division to decimal scale 6 — the native expression
      // (and the operator's DataFrame DSL, and the DuckDB oracle) all
      // divide in DOUBLE
      .withColumn("xhat",
        expr("lo_arr[d] + z.codes / 255.0D * (hi_arr[d] - lo_arr[d])"))
      .withColumn("t", round((col("z.qv") - col("xhat"))
        * (col("z.qv") - col("xhat")) * 1000000, 0).cast("bigint"))
      .groupBy("q_id", "vec_id").agg(sum("t").as("ref_t6"))
    assert(nat.join(refT, Seq("q_id", "vec_id"))
      .filter(col("t6") =!= col("ref_t6")).count() == 0,
      "sq8_dist disagrees with the composed distance")
    // null / shape semantics
    val bad = spark.sql(
      """SELECT sq8_dist(array(1.0d, 2.0d), array(1, 2, 3),
        |  array(0.0d, 0.0d), array(1.0d, 1.0d)) AS d1,
        |  sq8_dist(CAST(NULL AS ARRAY<DOUBLE>), array(1, 2),
        |  array(0.0d, 0.0d), array(1.0d, 1.0d)) AS d2,
        |  sq8_enc(array(0.25d), array(0.25d), array(0.25d)) AS e1""".stripMargin).head()
    assert(bad.isNullAt(0), "length mismatch must be null")
    assert(bad.isNullAt(1), "null input must be null")
    assert(bad.getSeq[Int](2) == Seq(0), "constant dim must encode to 0")
  }

  test("adc_dist6 agrees with the composed per-subspace lookup sum; malformed input is null") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val M = 4; val Ks = 8
    // 30 vectors of M codes + 5 query tables of M*Ks entries
    val codes = (0L until 30L).map(i =>
      (i, Seq.fill(M)(rnd.nextInt(Ks)))).toDF("vec_id", "codes")
    val tables = (0L until 5L).map(q =>
      (q, Seq.fill(M * Ks)(BigDecimal(rnd.nextDouble() * 3)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
      .toDF("q_id", "dtab")
    val nat = codes.crossJoin(broadcast(tables))
      .select(col("q_id"), col("vec_id"),
        call_function("adc_dist6", col("codes"), col("dtab")).as("t6"))
    // composed reference: explode the codes, index the flat table
    val ref = codes.crossJoin(broadcast(tables))
      .select(col("q_id"), col("vec_id"), col("dtab"),
        posexplode(col("codes")).as(Seq("m", "code")))
      .withColumn("dsub", expr(s"dtab[m * $Ks + code]"))
      .withColumn("t", round(col("dsub") * 1000000, 0).cast("bigint"))
      .groupBy("q_id", "vec_id").agg(sum("t").as("ref_t6"))
    assert(nat.join(ref, Seq("q_id", "vec_id"))
      .filter(col("t6") =!= col("ref_t6")).count() == 0,
      "adc_dist6 disagrees with the composed lookup sum")
    // malformed shapes are null, not wrong numbers
    val bad = spark.sql(
      """SELECT adc_dist6(array(1, 2), array(0.5d, 0.5d, 0.5d)) AS odd_table,
        |  adc_dist6(array(9), array(0.5d, 0.5d)) AS code_oob,
        |  adc_dist6(CAST(NULL AS ARRAY<INT>), array(0.5d)) AS nul""".stripMargin).head()
    assert(bad.isNullAt(0), "table not a multiple of codes must be null")
    assert(bad.isNullAt(1), "out-of-range code must be null")
    assert(bad.isNullAt(2), "null in, null out")
  }

  test("phash16: edge cases, eval/codegen agreement, and mixer bit balance") {
    import graft.functions.Phash16
    import org.apache.spark.unsafe.types.UTF8String
    // payloads shorter than one window still fingerprint (padded with 0)
    val row = spark.sql(
      """SELECT phash16('') AS empty, phash16('ab') AS one_byte,
        |  phash16(CAST(NULL AS STRING)) AS nul,
        |  phash16('deadbeef') AS word""".stripMargin).head()
    assert(!row.isNullAt(0) && !row.isNullAt(1), "short payloads must hash")
    assert(row.isNullAt(2), "null in, null out")
    // SQL (codegen) path agrees with the interpreted helper
    assert(row.getLong(3) ==
      Phash16.fingerprint(UTF8String.fromString("deadbeef")).asInstanceOf[Long])
    assert(row.getLong(0) ==
      Phash16.fingerprint(UTF8String.fromString("")).asInstanceOf[Long])
    // near-identical payloads land within the banding radius; distinct
    // payloads do not collide to the same fingerprint here
    val base = (1 to 80).map(i => f"$i%02x").mkString
    val flipped = "ff" + base.drop(2)
    val fpA = Phash16.fingerprint(UTF8String.fromString(base)).asInstanceOf[Long]
    val fpB = Phash16.fingerprint(UTF8String.fromString(flipped)).asInstanceOf[Long]
    assert(java.lang.Long.bitCount(fpA ^ fpB) <= 3,
      s"one flipped byte moved the fingerprint too far: $fpA vs $fpB")
    // mixer quality per WINDOW (doc-level majority bits legitimately
    // correlate across docs sharing vocabulary): a 4-byte payload has
    // exactly one window, so its fingerprint IS the window hash — each
    // of the 16 hash bits must be near-balanced over random windows,
    // or the banded pair search floods
    val rnd = new scala.util.Random(11)
    val hs = (1 to 4096).map { _ =>
      val hex = (1 to 4).map(_ => f"${rnd.nextInt(256)}%02x").mkString
      Phash16.fingerprint(UTF8String.fromString(hex)).asInstanceOf[Long]
    }
    (0 until 16).foreach { b =>
      val ones = hs.count(h => ((h >> b) & 1L) == 1L)
      assert(ones > 4096 * 35 / 100 && ones < 4096 * 65 / 100,
        s"window-hash bit $b biased: $ones of 4096 set")
    }
  }
}

package graft

import graft.operators.CoreAnalytics
import org.apache.spark.sql.functions._

class CoreAnalyticsSpec extends SparkTestBase {

  test("every core query returns rows and declared columns") {
    CoreAnalytics.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("q_abc_analysis: classes cut at the 80/95 cumulative boundaries, shares close at 1") {
    val df = CoreAnalytics.qAbcAnalysis(spark, sfDir).cache()
    assert(df.count() == graft.Tables.lineitem(spark, sfDir)
      .select("l_partkey").distinct().count())
    // the ranked walk ends at the full total
    val last = df.orderBy(col("cum_revenue").desc).limit(1).collect().head
    assert(math.abs(last.getDouble(3) - 1.0) < 1e-6)
    // class boundaries: every A row's cumulative share is <= 0.80,
    // every B row's <= 0.95 (inclusive-boundary rule), C above 0.95
    assert(df.filter(col("abc_class") === "A" && col("cum_share") > 0.800001).count() == 0)
    assert(df.filter(col("abc_class") === "B" &&
      (col("cum_share") > 0.950001 || col("cum_share") <= 0.799999)).count() == 0)
    assert(df.filter(col("abc_class") === "C" && col("cum_share") <= 0.949999).count() == 0)
    // cumulative revenue is nondecreasing in rank order
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("cum_revenue"))
    assert(df.withColumn("prev", lag(col("cum_revenue"), 1).over(w))
      .filter(col("prev").isNotNull && col("cum_revenue") < col("prev")).count() == 0)
    df.unpersist()
  }

  test("q_yoy_growth: growth recomputes from the adjacent revenue pair, gaps emit null") {
    val df = CoreAnalytics.qYoyGrowth(spark, sfDir).cache()
    assert(df.count() > 0)
    // wherever growth is non-null, it equals (rev - prev)/prev of the
    // row's own revenue columns at 6dp
    val bad = df.filter(col("yoy_growth").isNotNull)
      .withColumn("re", round((col("revenue") - col("prev_revenue")) / col("prev_revenue"), 6))
      .filter(col("yoy_growth") =!= col("re"))
    assert(bad.count() == 0)
    // each brand's first year has null growth
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("p_brand")).orderBy(col("yr"))
    val first = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(first.filter(col("yoy_growth").isNotNull).count() == 0)
    df.unpersist()
  }

  test("q_moving_corr: bounded in [-1,1], singleton windows null, 7-row window matches direct Pearson") {
    val df = CoreAnalytics.qMovingCorr(spark, sfDir).cache()
    assert(df.filter(col("corr_7d") < -1.000001 || col("corr_7d") > 1.000001).count() == 0)
    // the first ship-day has a single-row window: zero variance → null
    val first = df.orderBy(col("ship_date")).limit(1).collect().head
    assert(first.getLong(3) == 1 && first.isNullAt(4))
    // re-derive one full 7-day window by hand from the daily relation
    val rows = df.orderBy(col("ship_date")).limit(20).collect()
    val full = rows.find(_.getLong(3) == 7).get
    val idx = rows.indexOf(full)
    val win = rows.slice(idx - 6, idx + 1).map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble))
    val n = win.length.toDouble
    val (sx, sy) = (win.map(_._1).sum, win.map(_._2).sum)
    val sxy = win.map(p => p._1 * p._2).sum
    val (sxx, syy) = (win.map(p => p._1 * p._1).sum, win.map(p => p._2 * p._2).sum)
    val expected = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(math.abs(full.getDouble(4) - expected) < 1e-5,
      f"window corr ${full.getDouble(4)}%.6f vs direct $expected%.6f")
    df.unpersist()
  }

  test("q18 shape: every order exceeds the quantity threshold and the sum is the true lineitem sum") {
    val df = CoreAnalytics.q18LargeVolumeCustomers(spark, sfDir).cache()
    assert(df.count() > 0 && df.count() <= 100)
    assert(df.filter(col("sum_qty") <= 300).count() == 0)
    // one row per order, and the reported sum matches an independent
    // re-aggregation of lineitem for those orders
    assert(df.groupBy("o_orderkey").count().filter(col("count") > 1).count() == 0)
    val truth = graft.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("t"))
    assert(df.join(truth, col("o_orderkey") === col("l_orderkey"))
      .filter(col("sum_qty") =!= col("t")).count() == 0)
    df.unpersist()
  }

  test("q21 shape: winners are sole late suppliers of multi-supplier orders") {
    import graft.Tables
    val df = CoreAnalytics.q21SoleLateSupplier(spark, sfDir).cache()
    assert(df.count() <= 10 && df.count() > 0)
    // recompute the sole-late relation directly and cross-check one
    // winner's count
    val li = Tables.lineitem(spark, sfDir)
    val late = li.join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select("l_orderkey", "l_suppkey").distinct().cache()
    val soloCnt = late.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_late"), min("l_suppkey").as("only_supp"))
      .filter(col("n_late") === 1)
    val multi = li.select("l_orderkey", "l_suppkey").distinct()
      .groupBy("l_orderkey").agg(count(lit(1)).as("n_sup"))
      .filter(col("n_sup") > 1).select("l_orderkey")
    val expected = soloCnt.join(multi, "l_orderkey")
      .groupBy(col("only_supp").as("s_suppkey"))
      .agg(count(lit(1)).as("numwait_expected"))
    val off = df.join(expected, "s_suppkey")
      .filter(col("numwait") =!= col("numwait_expected"))
    assert(off.count() == 0)
  }

  test("q2 shape: every part appears, winners achieve the per-part minimum") {
    import graft.Tables
    val df = CoreAnalytics.q2MinPriceSupplier(spark, sfDir).cache()
    // every traded part has at least one cheapest supplier
    val traded = Tables.lineitem(spark, sfDir).select("l_partkey").distinct().count()
    assert(df.select("p_partkey").distinct().count() == traded)
    // no supplier row beats its part's published best price
    val unit = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").as("p_partkey"),
        round(col("l_extendedprice") / col("l_quantity"), 6).as("u"))
    val trueMin = unit.groupBy("p_partkey").agg(min("u").as("true_min"))
    assert(df.join(trueMin, "p_partkey")
      .filter(col("best_price") =!= col("true_min")).count() == 0)
  }

  test("q1 groups are the distinct flag/status pairs") {
    val df = CoreAnalytics.q1PricingSummary(spark, sfDir)
    val pairs = df.select("l_returnflag", "l_linestatus").collect().toSet
    assert(pairs.size == df.count())
    assert(df.columns.toSet.contains("sum_disc_price"))
  }

  test("top parts per brand never exceeds 3 per brand") {
    val df = CoreAnalytics.topPartsPerBrand(spark, sfDir)
    val maxPerBrand = df.groupBy("p_brand").count().agg(max("count")).head().getLong(0)
    assert(maxPerBrand <= 3)
    assert(df.filter(col("rank_in_brand") > 3).count() == 0)
  }

  test("rollup includes the grand-total row") {
    val df = CoreAnalytics.rollupSummary(spark, sfDir)
    val total = df.filter(col("l_returnflag").isNull && col("l_linestatus").isNull)
    assert(total.count() == 1)
    val n = total.head().getAs[Long]("n_rows")
    assert(n == Tables.lineitem(spark, sfDir).count())
  }

  test("orders_enriched priority class is exhaustive") {
    val df = CoreAnalytics.ordersEnriched(spark, sfDir)
    val classes = df.select("priority_class").distinct().collect().map(_.getString(0)).toSet
    assert(classes.subsetOf(Set("urgent", "normal")))
  }

  test("customer deciles: buckets 1..10, monotone in revenue within nation") {
    val df = CoreAnalytics.customerDeciles(spark, sfDir).cache()
    assert(df.filter(col("decile") < 1 || col("decile") > 10).count() == 0)
    assert(df.filter(col("pct_rank") < 0 || col("pct_rank") > 1).count() == 0)
    // a customer in decile d never out-earns anyone in decile d-1
    val b = df.groupBy(col("n_name"), col("decile"))
      .agg(max(col("revenue")).as("mx"), min(col("revenue")).as("mn"))
    val adj = b.select(col("n_name"), col("decile"), col("mn"))
      .join(b.select(col("n_name"), (col("decile") - 1).as("decile"), col("mx").as("next_mx")),
        Seq("n_name", "decile"))
    assert(adj.filter(col("next_mx") > col("mn")).count() == 0)
    df.unpersist()
  }


  test("rfm segmentation: scores quintile-balanced, segments consistent with raw metrics") {
    val df = CoreAnalytics.qRfmSegmentation(spark, sfDir).cache()
    val n = df.count()
    assert(n == Tables.orders(spark, sfDir).select("o_custkey").distinct().count())
    for (c <- Seq("r_score", "f_score", "m_score")) {
      assert(df.filter(col(c) < 1 || col(c) > 5).count() == 0, s"$c out of range")
      // integer-rank quintiles: bucket sizes differ by at most 1
      val sizes = df.groupBy(c).count().collect().map(_.getLong(1))
      assert(sizes.length == 5 || n < 5, s"$c missing buckets")
      assert(sizes.max - sizes.min <= 1, s"$c unbalanced: ${sizes.mkString(",")}")
    }
    // the label logic follows the scores: champions beat hibernating on
    // every raw axis on average
    val avgOf = (seg: String, c: String) => df.filter(col("segment") === seg)
      .agg(avg(col(c))).head().getDouble(0)
    if (df.filter(col("segment") === "champion").count() > 0 &&
        df.filter(col("segment") === "hibernating").count() > 0) {
      assert(avgOf("champion", "monetary") > avgOf("hibernating", "monetary"))
      assert(avgOf("champion", "recency_days") < avgOf("hibernating", "recency_days"))
    }
    df.unpersist()
  }

  test("basket lift: supports are probabilities, counts bounded, lift matches independence ratio") {
    val df = CoreAnalytics.qBasketLift(spark, sfDir).cache()
    assert(df.count() > 0)
    assert(df.filter(col("support") <= 0 || col("support") > 1).count() == 0)
    assert(df.filter(col("brand_a") >= col("brand_b")).count() == 0)
    // recompute one pair end-to-end as ground truth
    val items = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
    val top = df.orderBy(col("n_both").desc).head()
    val (ba, bb) = (top.getString(0), top.getString(1))
    val nBoth = items.filter(col("p_brand") === ba).select("l_orderkey")
      .join(items.filter(col("p_brand") === bb).select("l_orderkey"), "l_orderkey")
      .count()
    assert(top.getLong(2) == nBoth, s"pair count ${top.getLong(2)} != $nBoth")
    df.unpersist()
  }

  test("trailing 7d window equals the direct interval self-join") {
    val df = CoreAnalytics.trailingRevenue7d(spark, sfDir).cache()
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("k"), col("o_orderdate").as("d"),
        col("o_totalprice").as("p"))
    val truth = df.join(o, col("o_custkey") === col("k")
        && datediff(col("o_orderdate"), col("d")).between(0, 6))
      .groupBy("o_custkey", "o_orderkey")
      .agg(round(sum(col("p")), 2).as("expected"))
    val joined = df.join(truth, Seq("o_custkey", "o_orderkey"))
    assert(joined.filter(abs(col("trailing_7d") - col("expected")) > 1e-6).count() == 0)
    df.unpersist()
  }

}

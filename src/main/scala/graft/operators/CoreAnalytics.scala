package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core analytical queries — the query engine underneath the reference's
  * ETL (grouped aggregation, star joins, windows, grouping sets).
  *
  * Scale notes: filters sit directly on the scans (parquet pushdown),
  * dims are broadcast explicitly, fact-fact joins shuffle on their keys
  * and rely on AQE for runtime re-planning. All aggregates are rounded
  * so results are stable across engines/partitionings.
  */
object CoreAnalytics {

  /** TPC-H Q1-style pricing summary. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3-style shipping priority: 3-way join + agg + top-k. */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    // customer SCALES with the dataset — no broadcast hint; the cost
    // model broadcasts it at small SF and shuffles at 100 TB
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style local-supplier revenue: star join over 6 tables. */
  def q5RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
    val supp   = Tables.supplier(spark, dir)
    val cust   = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    // customer/supplier scale with the data (no hint — CBO/AQE decide);
    // nation (25 rows) and region (5) are bounded → broadcast explicitly
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(supp.select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.select("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Top-3 parts per brand by retail price — window top-N per group. */
  def topPartsPerBrand(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(spark, dir)
      .select("p_partkey", "p_name", "p_brand", "p_retailprice")
      .withColumn("rank_in_brand", row_number().over(w))
      .filter(col("rank_in_brand") <= 3)
      .orderBy(col("p_brand"), col("rank_in_brand"))
  }

  /** ROLLUP grouping sets over return flag / line status. */
  def rollupSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(
        coalesce(col("l_returnflag"), lit("~")),
        coalesce(col("l_linestatus"), lit("~")))

  /** Orders enriched with customer dim (broadcast) + priority class. */
  def ordersEnriched(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_name", "c_mktsegment")
    Tables.orders(spark, dir)
      .join(cust, col("o_custkey") === col("c_custkey")) // scales: no hint
      .select(
        col("o_orderkey"),
        col("c_name"),
        col("c_mktsegment"),
        col("o_totalprice"),
        when(substring(col("o_orderpriority"), 1, 1).isin("1", "2"), lit("urgent"))
          .otherwise(lit("normal")).as("priority_class"))
      .orderBy(col("o_orderkey"))
  }

  /** Skew-resilient fact⋈dim join via key salting: the dim side is
    * replicated `Salt` ways, the fact side picks a deterministic salt,
    * and the join key becomes (key, salt) — a hot key's rows now spread
    * over `Salt` reducers instead of melting one. The salt is invisible
    * in the result (oracle = the plain join), which is exactly the
    * point: same answer, flatter task histogram. AQE's skew-join split
    * handles moderate skew automatically; explicit salting is the tool
    * when a single key exceeds what one task can hold at 100 TB.
    */
  def saltedSkewJoin(spark: SparkSession, dir: String): DataFrame = {
    val Salt = 8
    val li = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"),
        pmod(col("l_orderkey"), lit(Salt)).cast("int").as("salt"))
    val supp = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey"))
      .withColumn("salt", explode(sequence(lit(0), lit(Salt - 1))))
    li.join(supp,
        col("l_suppkey") === col("s_suppkey") && li("salt") === supp("salt"))
      .groupBy(col("s_nationkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      .orderBy(col("s_nationkey"))
  }

  /** Banded range join: all part pairs whose retail prices lie within
    * `Tol` of each other. The naive plan is an inequality join — a
    * broadcast nested loop, O(n²) at any scale. Banding turns it into
    * an equi-join: band = floor(price/Tol); |pa−pb| ≤ Tol implies the
    * bands differ by at most 1, so one side explodes into
    * {band−1, band, band+1} and the join key is the band. Each
    * qualifying pair matches on EXACTLY one band value (the build
    * side's own band), so no dedup is needed; the exact predicate
    * filters band-neighbors that are just outside the tolerance.
    * One shuffle on the band key; candidates per band stay bounded by
    * the price density, not the table size.
    *
    * SCALE CONTRACT: the result is the UNBOUNDED pair set — within a
    * fixed price range true pairs grow ∝ n², so the output (not the
    * plan) is quadratic; at sf0.5 the pair set is 50.8M rows and the
    * query is output-bound by design. Production callers that want
    * "nearby parts" should use [[priceBandJoinTopk]], the K-capped
    * twin: same tolerance, O(n·K) output, built on the coordinate
    * collapse so the work is sub-quadratic too.
    */
  def priceBandJoin(spark: SparkSession, dir: String): DataFrame =
    priceBandPairs(spark, dir)
      .select(col("key_a"), col("key_b"), col("price_a"), col("price_b"),
        round(abs(col("price_a") - col("price_b")), 6).as("price_diff"))
      .orderBy(col("key_a"), col("key_b"))

  /** The banded pair relation (key_a < key_b, |Δprice| ≤ 0.5) without
    * presentation columns/sort — shared with [[GraphOps]], which uses
    * the price-proximity graph as its test pair graph.
    */
  private[operators] def priceBandPairs(spark: SparkSession, dir: String): DataFrame = {
    val Tol = 0.5
    val base = Tables.part(spark, dir).select(col("p_partkey"), col("p_retailprice"))
    val a = base
      .select(col("p_partkey").as("key_a"), col("p_retailprice").as("price_a"))
      .withColumn("band", explode(array((-1 to 1).map(d =>
        floor(col("price_a") / Tol).cast("long") + d): _*)))
    val b = base
      .select(col("p_partkey").as("key_b"), col("p_retailprice").as("price_b"),
        floor(col("p_retailprice") / Tol).cast("long").as("band"))
    a.join(b, Seq("band"))
      .filter(col("key_a") < col("key_b") &&
        abs(col("price_a") - col("price_b")) <= Tol)
  }

  /** The K-capped production twin of [[priceBandJoin]]: each part's K
    * nearest other parts by |Δprice| ≤ 0.5, ranked by (rounded diff,
    * neighbor key). The unbounded pair set is the AUDIT form (the
    * pairs ARE the answer, so its output is quadratic by contract);
    * this is what a production pipeline should run — output O(n·K),
    * and the build rides [[GraphOps.knnListsSymmetric]]'s coordinate
    * collapse (group by exact price, only a group's K+1 smallest keys
    * enter the band join), so the WORK is sub-quadratic in the
    * duplication regime too. Directly oracle-checks the directed kNN
    * lists the whole graph family builds on.
    */
  def priceBandJoinTopk(spark: SparkSession, dir: String): DataFrame = {
    val nodes = GraphOps.partNodes(spark, dir)
    val lists = GraphOps.knnListsSymmetric(nodes)
    val priced = lists
      .join(nodes.select(col("key").as("u"), col("price").as("price_u")), "u")
      .join(nodes.select(col("key").as("v"), col("price").as("price_v")), "v")
      .withColumn("price_diff", round(abs(col("price_u") - col("price_v")), 6))
    // the lists are already the top-K by (diff, v); re-ranking the ≤K
    // survivors with the same order reproduces the global rank
    val w = Window.partitionBy(col("u")).orderBy(col("price_diff"), col("v"))
    priced.withColumn("rank", row_number().over(w))
      .select(col("u").as("key"), col("v").as("neighbor"),
        col("price_u"), col("price_v"), col("price_diff"), col("rank"))
      .orderBy(col("key"), col("rank"))
  }

  /** Explicit GROUPING SETS — the third grouping surface next to
    * ROLLUP/CUBE: exactly the requested granularities
    * ((returnflag, linestatus) and (linestatus)), still ONE pass with
    * the expansion inside the aggregation; `grouping(...)` flags
    * disambiguate a real NULL group key from a rolled-up one, which is
    * how BI layers consume these results.
    */
  def groupingSetsSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.createOrReplaceTempView("lineitem_gs")
    li.sparkSession.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g_flag,
        |  count(*) AS n_rows,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus))
        |ORDER BY coalesce(l_returnflag, '~'), coalesce(l_linestatus, '~'), g_flag""".stripMargin)
  }

  /** CUBE grouping sets: all 2^2 aggregation granularities in one pass
    * (Spark expands the grouping sets inside a single aggregation —
    * no per-granularity rescan).
    */
  def cubeSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy(
        coalesce(col("l_returnflag"), lit("~")),
        coalesce(col("l_linestatus"), lit("~")))

  /** Running revenue per customer over order dates — cumulative window
    * (one shuffle on the customer key, ordered scan within).
    */
  def runningRevenue(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("running_total", round(sum(col("o_totalprice")).over(w), 4))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** Per-nation customer revenue deciles: `ntile(10)` + `percent_rank`
    * over the nation-partitioned revenue ordering — the distribution-
    * ranking window tier (segmentation/percentile reporting). The
    * window is PARTITIONED (by nation), so no global sort: each nation's
    * ranking is an independent within-partition pass after one shuffle
    * on the nation key. Revenue is rounded to 2 decimals BEFORE ranking
    * (ties then break on the customer key) so both engines rank the
    * same total order. At extreme per-partition cardinality, swap ntile
    * for percentile-threshold bucketing (1-row cutoff aggregate
    * broadcast) — same output contract.
    */
  def customerDeciles(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"))
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val nat = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
    rev.join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .select(col("n_name"), col("c_custkey").as("custkey"),
        col("revenue"), col("decile"), col("pct_rank"))
      .orderBy(col("n_name"), col("custkey"))
  }

  /** Trailing-7-day revenue per customer — the RANGE-frame window tier
    * (vs `q_running_revenue`'s ROWS frame): the frame is bounded by the
    * ORDER-BY VALUE (order day within the last 6 days), not a row
    * count, so same-day orders always share a frame and sparse
    * histories window correctly. Ordering on the integer day number
    * keeps the frame spec engine-neutral; one shuffle on the customer
    * key like every other per-customer window.
    */
  def trailingRevenue7d(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day_num"))
      .rangeBetween(-6, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("day_num",
        datediff(col("o_orderdate"), lit("1992-01-01").cast("date")).cast("long"))
      .withColumn("trailing_7d", round(sum(col("o_totalprice")).over(w), 2))
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "trailing_7d")
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** ABC / PARETO analysis of the part catalog — rank every part by
    * revenue and classify by cumulative share (A carries the first
    * 80%, B to 95%, C the tail): the concentration report behind
    * assortment and inventory policy ("which 20% of parts earn 80% of
    * revenue"). The GLOBAL ordered cumsum is the scale hazard here —
    * a naive unpartitioned window funnels the whole catalog through
    * one task — so the running total rides the shared two-phase
    * [[CorpusOps.keyedCumsum]] (range partition → local cumsum →
    * broadcast slice offsets; parallelism ∝ data). Float discipline:
    * per-part revenue is 4-dp rounded then 10⁴-scaled to exact
    * bigints, so the cumulative totals and the class boundaries
    * (cum·100 ≤ total·80) are pure integer arithmetic; the share is
    * one rounded division at the end.
    */
  def qAbcAnalysis(spark: SparkSession, dir: String): DataFrame = {
    val perPart = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .groupBy(col("l_partkey"))
      .agg(round(sum(col("rev")), 4).as("revenue"))
      .withColumn("rev4", expr("cast(round(revenue * 10000, 0) as bigint)"))
      .withColumn("k", lit(1))
    val cum = CorpusOps.keyedCumsum(perPart, "k",
      Seq(col("rev4").desc, col("l_partkey")), "rev4", "cum4")
    val total = perPart.agg(sum(col("rev4")).as("total4"))
    cum.crossJoin(broadcast(total))
      .withColumn("cum_share", round(col("cum4") / col("total4"), 6))
      .withColumn("abc_class",
        when(col("cum4") * 100 <= col("total4") * 80, "A")
          .when(col("cum4") * 100 <= col("total4") * 95, "B")
          .otherwise("C"))
      .select(col("l_partkey"), col("revenue"),
        round(col("cum4") / 10000.0, 4).as("cum_revenue"),
        col("cum_share"), col("abc_class"))
      .orderBy(col("cum_revenue"), col("l_partkey"))
  }

  /** Year-over-year GROWTH per brand — the comparative-period report
    * (this year vs the same period last year) every revenue review
    * leads with: yearly brand revenue, the prior year's value via a
    * brand-partitioned lag, and the growth ratio. The lag window runs
    * over the (brand × year) AGGREGATE — a few hundred rows at any
    * fact volume; the growth ratio derives from two already-rounded
    * revenue values, so both engines divide identical doubles. First
    * observed year per brand emits null growth.
    */
  def qYoyGrowth(spark: SparkSession, dir: String): DataFrame = {
    val yearly = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), year(col("l_shipdate")).as("yr"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .join(Tables.part(spark, dir).select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("yr"))
      .agg(round(sum(col("rev")), 4).as("revenue"))
    val w = Window.partitionBy(col("p_brand")).orderBy(col("yr"))
    yearly
      .withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
      .withColumn("prev_yr", lag(col("yr"), 1).over(w))
      .withColumn("yoy_growth",
        when(col("prev_yr") === col("yr") - 1 && col("prev_revenue") > 0,
          round((col("revenue") - col("prev_revenue")) / col("prev_revenue"), 6)))
      .select(col("p_brand"), col("yr"), col("revenue"),
        col("prev_revenue"), col("yoy_growth"))
      .orderBy(col("p_brand"), col("yr"))
  }

  /** Rolling PEARSON CORRELATION — the windowed bivariate-statistics
    * tier (no other operator relates two measures over a moving
    * window): for each ship-day, the correlation between daily units
    * shipped and daily revenue over the trailing 7 observed days —
    * "does revenue still track volume?", the demand-mix drift signal a
    * daily ops review watches. Discipline for engine-exact floats:
    * the daily aggregates are INTEGERS (quantities are integral;
    * revenue rounds to whole units), carried as DECIMAL(38,0) so the
    * six window sums (n, Σx, Σy, Σxy, Σx², Σy²) are exact at any
    * frame alignment and any daily magnitude — order-free, and an
    * overflow past 38 digits nulls loudly instead of wrapping (DuckDB
    * mirrors with exact HUGEINT sums). corr derives from them in ONE
    * double expression, num / (√f1·√f2) with f1 = nΣx²−(Σx)²,
    * f2 likewise: both engines evaluate identical IEEE ops on
    * identical exact integers. Zero-variance windows emit null. The
    * window runs over the
    * DAILY aggregate (one row per ship-day) — cost independent of raw
    * fact volume, the same above-the-aggregation shape the plan guard
    * allows for global windows.
    */
  def qMovingCorr(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(spark, dir)
      .select(col("l_shipdate"), col("l_quantity"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .groupBy(col("l_shipdate").cast("date").as("ship_date"))
      .agg(sum(col("l_quantity")).cast("bigint").as("x"),
        round(sum(col("rev")), 0).cast("bigint").as("y"))
    // Exact wide-integer window sums: decimal(19,0) daily values make
    // the squared/cross products decimal(38,0) — no silent bigint wrap
    // at any daily magnitude; a >38-digit overflow nulls loudly.
    val xd = col("x").cast("decimal(19,0)")
    val yd = col("y").cast("decimal(19,0)")
    val w = Window.orderBy(col("ship_date")).rowsBetween(-6, Window.currentRow)
    val nd = col("n").cast("decimal(19,0)")
    val f1 = nd * col("sxx") - col("sx") * col("sx")
    val f2 = nd * col("syy") - col("sy") * col("sy")
    daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(xd).over(w))
      .withColumn("sy", sum(yd).over(w))
      .withColumn("sxy", sum(xd * yd).over(w))
      .withColumn("sxx", sum(xd * xd).over(w))
      .withColumn("syy", sum(yd * yd).over(w))
      .withColumn("corr_7d",
        when(f1 > 0 && f2 > 0, round(
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (sqrt(f1.cast("double")) * sqrt(f2.cast("double"))), 6)))
      .select(col("ship_date"), col("x").as("units"), col("y").as("revenue_units"),
        col("n").as("n_days"), col("corr_7d"))
      .orderBy(col("ship_date"))
  }

  /** Order-priority census over late-shipped orders — the EXISTS
    * correlated-subquery tier (TPC-H Q4 shape, with l_shipdate >
    * o_orderdate standing in for the commit/receipt columns this schema
    * lacks). Spark plans the EXISTS as a LEFT SEMI join: lineitem is
    * touched once, shuffled on the order key, and each order emits at
    * most one row into the aggregate no matter how many lines qualify —
    * the semi join IS the decorrelation, no per-order subquery ever
    * executes. Date filter sits on the orders scan (parquet pushdown).
    */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1996-07-01").cast("timestamp"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
    ord.join(li,
        col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** Every part scored against its brand's average price, flagged when
    * ≥5% above it — the correlated SCALAR-subquery tier (TPC-H Q17
    * shape). The correlated `(SELECT avg(...) WHERE brand =
    * outer.brand)` decorrelates into one grouped aggregate over the
    * ~25 bounded brands, broadcast back onto the scan: the fact side
    * is read once and never shuffles. The brand average is rounded
    * in-query and the flag compares the ROUNDED ratio so both engines
    * apply the same cutoff to the same 6-decimal value (raw float
    * compares at a threshold boundary are where engines disagree).
    */
  def brandPremium(spark: SparkSession, dir: String): DataFrame = {
    val avgb = Tables.part(spark, dir)
      .groupBy(col("p_brand"))
      .agg(round(avg(col("p_retailprice")), 6).as("brand_avg"))
    Tables.part(spark, dir)
      .select("p_partkey", "p_brand", "p_retailprice")
      .join(broadcast(avgb), "p_brand") // bounded dim: ~25 brands
      .withColumn("premium_ratio", round(col("p_retailprice") / col("brand_avg"), 6))
      .withColumn("is_premium", col("premium_ratio") > 1.05)
      .select("p_partkey", "p_brand", "p_retailprice", "brand_avg",
        "premium_ratio", "is_premium")
      .orderBy(col("p_partkey"))
  }

  /** Large-volume orders (TPC-H Q18 shape): orders whose total lineitem
    * quantity clears a threshold, enriched with customer identity. The
    * scale move is aggregate-BEFORE-join: lineitem collapses to one row
    * per order and the HAVING filter drops ~99.9% of them before any
    * join runs, so the joins see survivors (hundreds) instead of the
    * fact table (billions at 100 TB). Threshold 260 keeps a stable
    * result set in the synthetic data (~99.9th percentile of per-order
    * quantity).
    */
  def largeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
      .filter(col("total_qty") > 260)
    big.join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
  }

  /** Bi-directional trade volume between two nations by ship year
    * (TPC-H Q7 shape) — the SELF-ALIASED dim pattern: the nation table
    * joins twice under different roles (supplier's nation, customer's
    * nation) with an OR-of-pairs predicate that only the combination of
    * both aliases can evaluate. Both alias sides are the same bounded
    * 25-row dim → broadcast twice; the pair predicate prunes after the
    * second dim attach, so the fact side still sees only equi-joins.
    * Date filter sits on the lineitem scan (pushdown).
    */
  def q7BiNationVolume(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables.nation(spark, dir).select("n_nationkey", "n_name")
      .filter(col("n_name").isin("NATION_10", "NATION_12"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    li.join(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat.select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("sn_key"))
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat.select(col("n_nationkey").as("cn_key"),
        col("n_name").as("cust_nation"))), col("c_nationkey") === col("cn_key"))
      .filter(
        (col("supp_nation") === "NATION_10" && col("cust_nation") === "NATION_12") ||
        (col("supp_nation") === "NATION_12" && col("cust_nation") === "NATION_10"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** Customer order-count distribution (TPC-H Q13 shape) — the OUTER-
    * JOIN AGGREGATE tier: customers who never ordered must appear in
    * the 0-bucket, so the join is LEFT OUTER and the count is over the
    * nullable right key (`count(col)` skips nulls — the semantics the
    * histogram depends on). Two aggregations: per-customer counts
    * shuffle on the customer key, the histogram then runs over
    * #distinct-counts rows.
    */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame = {
    val co = Tables.customer(spark, dir).select("c_custkey")
      .join(Tables.orders(spark, dir).select("o_custkey", "o_orderkey"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    co.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Top supplier by quarterly revenue (TPC-H Q15 shape) — the ARGMAX-
    * VIA-SCALAR tier: the max revenue is a 1-row aggregate joined back
    * by EQUALITY (ties all surface, no arbitrary winner), never a sort
    * of the whole revenue relation. Revenue is rounded before the max
    * and the equality so both engines compare identical values.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("total_rev"))
    val mx = rev.agg(max(col("total_rev")).as("mx"))
    rev.join(broadcast(mx), col("total_rev") === col("mx"))
      .join(Tables.supplier(spark, dir).select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
      .orderBy(col("s_suppkey"))
  }

  /** Dormant high-balance customers per nation (TPC-H Q22 shape) —
    * global scalar subquery + NOT EXISTS in one plan: the
    * above-average-balance cut is a 1-row broadcast aggregate (never a
    * second scan pass per row), the "no recent orders" condition is a
    * LEFT ANTI join on the pre-filtered, deduplicated order keys. The
    * average is rounded before the comparison so both engines cut at
    * the same value.
    */
  def q22DormantCustomers(spark: SparkSession, dir: String): DataFrame = {
    val avgBal = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 0)
      .agg(round(avg(col("c_acctbal")), 6).as("abal"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select(col("o_custkey")).distinct()
    Tables.customer(spark, dir)
      .select("c_custkey", "c_nationkey", "c_acctbal")
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("abal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_dormant"),
        round(sum(col("c_acctbal")), 2).as("total_bal"))
      .orderBy(col("c_nationkey"))
  }

  /** TPC-H Q21 shape — the hardest subquery tier: an EXISTS and a NOT
    * EXISTS that BOTH correlate back into the fact table itself
    * ("suppliers who were the SOLE late shipper of a multi-supplier
    * order"; late = shipped > 60 days after the order date, on this
    * schema). Decorrelation is structural, not expression-level:
    *  - EXISTS (another supplier in the order) → a pre-aggregated
    *    multi-supplier order keyset equi-joined in (the semi join);
    *  - NOT EXISTS (another LATE supplier in the order) → a LEFT ANTI
    *    self-join of the late relation on the order key with a
    *    supplier inequality.
    * Everything downstream of the two DISTINCT projections runs on
    * (order, supplier) relations — order-of-magnitude smaller than the
    * fact table — and every join is keyed on l_orderkey: one shuffle
    * family, no nested loops, AQE-splittable if an order is hot. The
    * top-10 is TakeOrdered over the ≤ #suppliers aggregate.
    */
  def q21SoleLateSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ls = li.select(col("l_orderkey"), col("l_suppkey")).distinct()
    val multi = ls.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_sup")).filter(col("n_sup") > 1)
      .select("l_orderkey")
    // late is read twice (candidate side + anti side); localCheckpoint
    // materializes the deduplicated (order, supplier) relation once —
    // one fact-table pass instead of two (same rationale as the shared
    // shingle relation in Dedup; reliable checkpoint() on a cluster)
    val late = li
      .join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
      .localCheckpoint()
    val sole = late.join(multi, "l_orderkey").as("c")
      .join(late.as("x"),
        col("c.l_orderkey") === col("x.l_orderkey") &&
          col("c.l_suppkey") =!= col("x.l_suppkey"),
        "left_anti")
    sole
      .join(Tables.supplier(spark, dir).select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  /** TPC-H Q2 shape — the per-GROUP correlated-minimum tier (Q17/
    * q_brand_premium decorrelates a scalar per bounded dim; Q15/
    * q15_top_supplier a single global extreme; this one needs the
    * minimum PER PART joined back by equality, ties surfacing):
    * "each part's cheapest supplier" by observed unit price. The
    * correlated `= (SELECT min ...)` decorrelates into the
    * per-(part, supplier) minima aggregate (one shuffle) topped by a
    * part-partitioned `rank() = 1` window — rank, not row_number, so
    * price ties surface exactly like an equality join-back, but the
    * fact table is scanned ONCE (the join-back formulation reads it
    * twice) and InferWindowGroupLimit turns the rank filter into a
    * partial group limit. Supplier names attach by a bounded-dim join
    * the cost model broadcasts while it fits.
    */
  def q2MinPriceSupplier(spark: SparkSession, dir: String): DataFrame = {
    val unit = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") / col("l_quantity"), 6).as("unit_price"))
    val perSupp = unit.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("unit_price")).as("supp_min"))
    val w = Window.partitionBy(col("l_partkey")).orderBy(col("supp_min"))
    perSupp
      .withColumn("rk", rank().over(w))
      .filter(col("rk") === 1)
      .join(Tables.supplier(spark, dir).select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey").as("p_partkey"), col("s_suppkey"),
        col("s_name"), col("supp_min").as("best_price"))
      .orderBy(col("p_partkey"), col("s_suppkey"))
  }

  /** TPC-H Q6 shape — pure scan-side aggregation: every predicate
    * (date range, discount band, quantity cap) sits directly on the
    * lineitem scan, so the whole query is a parquet scan with pushed
    * filters feeding one partial+final agg — zero joins, one exchange
    * (the final 1-row agg). At 100 TB this is the cheapest possible
    * full-table query: min/max page statistics skip whole row groups
    * outside the ship-date year.
    */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
              col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
              col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4).as("revenue"))

  /** TPC-H Q8 shape — market-share-by-year: the numerator is a
    * conditional slice of the denominator, so ONE aggregation computes
    * both (sum(when(...)) / sum(...)) instead of two query trees.
    * Customer-side nation/region restrict the orders; the supplier's
    * nation feeds the share condition. Bounded dims (nation, region)
    * broadcast; the scaling joins (orders, customer, supplier) shuffle
    * on their keys.
    */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables.nation(spark, dir).select("n_nationkey", "n_name", "n_regionkey")
    val amer = Tables.region(spark, dir)
      .filter(col("r_name") === "AMERICA").select("r_regionkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat.select(col("n_nationkey").as("cn_key"),
        col("n_regionkey"))), col("c_nationkey") === col("cn_key"))
      .join(broadcast(amer), col("n_regionkey") === col("r_regionkey"))
      .join(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat.select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("sn_key"))
      .withColumn("volume", col("l_extendedprice") * (lit(1) - col("l_discount")))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === "NATION_5", col("volume")).otherwise(0))
          / sum(col("volume")), 6).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q9 shape — profit by supplier nation × year for one product
    * type. The part filter (p_type) prunes the fact early via the
    * partkey join; nation is bounded → broadcast; supplier/orders
    * shuffle. (This schema has no partsupp/supplycost, so "profit" is
    * the discounted revenue — the join/agg topology is Q9's.)
    */
  def q9ProfitByNation(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(Tables.part(spark, dir).filter(col("p_type") === "STANDARD")
        .select("p_partkey"), col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)

  /** TPC-H Q10 shape — returned-item reporting: top-20 customers by
    * revenue lost to returns in one quarter. The quarter filter prunes
    * orders on the scan; the R-flag filter prunes lineitem; top-20 is
    * TakeOrdered (no global sort materialization).
    */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1997-04-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir)
        .select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q11 shape — grouped value filtered by a scalar fraction of
    * the GLOBAL total: per-part shipped value from one REGION's
    * suppliers, kept only when it exceeds 0.1% of that region's total.
    * The correlated HAVING decorrelates into a 1-row total aggregate
    * cross-broadcast onto the grouped relation — the grouped agg is
    * computed ONCE and reused for the total (no second fact pass).
    * (This schema has no partsupp; shipped value stands in for stock
    * value — the grouped-vs-global-scalar topology is Q11's. A region,
    * not a nation, keeps the supplier slice non-empty at every SF.)
    */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    val euro = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir).filter(col("r_name") === "EUROPE")
        .select("r_regionkey"), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey")
    val perPart = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(euro), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("l_partkey"))
      // rounded BEFORE the threshold compare (q22's discipline): both
      // engines then filter the same 4-decimal values
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("part_value"))
      .localCheckpoint() // feeds the total AND the filtered output
    val total = perPart.agg(round(sum(col("part_value")) * 0.001, 6).as("thresh"))
    perPart.crossJoin(broadcast(total))
      .filter(col("part_value") > col("thresh"))
      .select(col("l_partkey").as("p_partkey"), col("part_value"))
      .orderBy(col("part_value").desc, col("p_partkey"))
  }

  /** TPC-H Q12 shape — conditional (pivot-style) aggregation over a
    * derived dimension: ship-delay bands × order-priority class, both
    * computed row-side so the whole query is one join + one grouped agg
    * with two conditional sums. (This schema has no shipmode/commit
    * date; the delay band replaces shipmode as the Q12 bucket.)
    */
  def q12ShipPriority(spark: SparkSession, dir: String): DataFrame = {
    val delay = datediff(col("l_shipdate"), col("o_orderdate"))
    Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
      .join(Tables.orders(spark, dir)
        .select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay_band",
        when(delay <= 30, "0-30").when(delay <= 60, "31-60")
          .when(delay <= 90, "61-90").otherwise("90+"))
      .groupBy(col("delay_band"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
          .otherwise(0)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0)
          .otherwise(1)).as("low_line_count"))
      .orderBy(col("delay_band"))
  }

  /** TPC-H Q14 shape — promo revenue share in one month: numerator is
    * a conditional slice of the denominator (one agg, like Q8), and the
    * part join carries only (p_partkey, p_type).
    */
  def q14PromoShare(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-10-01").cast("timestamp"))
      .select("l_partkey", "l_extendedprice", "l_discount")
      .join(Tables.part(spark, dir).select("p_partkey", "p_type"),
        col("l_partkey") === col("p_partkey"))
      .withColumn("volume", col("l_extendedprice") * (lit(1) - col("l_discount")))
      .agg(round(
        lit(100) * sum(when(col("p_type") === "PROMO", col("volume")).otherwise(0))
          / sum(col("volume")), 6).as("promo_revenue_pct"))

  /** TPC-H Q16 shape — supplier variety per (brand, type, size) with a
    * NOT-IN supplier exclusion. The (part, supplier) relation is the
    * deduplicated fact projection (this schema's partsupp surrogate);
    * the exclusion list (negative-balance suppliers) decorrelates to a
    * LEFT ANTI join; count(DISTINCT) runs with partial aggregation.
    */
  def q16SupplierVariety(spark: SparkSession, dir: String): DataFrame = {
    val excl = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    val ps = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey").distinct()
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    ps.join(excl, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** TPC-H Q17 shape — small-quantity revenue against a per-part
    * correlated average. Decorrelated as a part-partitioned window avg
    * over the (already part-filtered) fact slice: ONE shuffle computes
    * the threshold and filters against it (the agg+join-back form would
    * shuffle twice). Quantities are integer-valued doubles, so the avg
    * is bit-identical across engines and the 0.2× threshold is safe to
    * compare unrounded; only the money sum is rounded.
    */
  def q17SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#3" && col("p_type") === "MEDIUM")
      .select("p_partkey")
    val w = Window.partitionBy(col("l_partkey"))
    Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(p, col("l_partkey") === col("p_partkey"))
      .withColumn("qty_thresh", avg(col("l_quantity")).over(w) * 0.2)
      .filter(col("l_quantity") < col("qty_thresh"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 4).as("avg_yearly"))
  }

  /** TPC-H Q19 shape — disjunctive join predicates: the partkey
    * equi-key is extractable from every OR branch, so Catalyst plans a
    * hash join with the (brand, size, quantity) disjunction as a
    * residual filter — NOT a nested loop. PlanGuardSpec pins that.
    */
  def q19DisjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val p = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")
    li.join(p, col("l_partkey") === col("p_partkey") && (
        (col("p_brand") === "Brand#3"  && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#14" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#25" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30))))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("revenue"))
  }

  /** TPC-H Q20 shape — suppliers concentrating a part's flow: the
    * per-(part, supplier) aggregate feeds BOTH the per-part total (a
    * second, much smaller agg over it) and the threshold join, so it is
    * localCheckpoint'd once (reliable checkpoint on a cluster); the
    * fact table is scanned a single time. Quantities are integer-valued
    * doubles → the 0.3× threshold compares identically across engines.
    */
  def q20TopPartSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val promo = Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO").select("p_partkey")
    val perSupp = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1998-01-01").cast("timestamp"))
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(promo, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("supp_qty"))
      .localCheckpoint()
    val perPart = perSupp.groupBy(col("l_partkey"))
      .agg(sum(col("supp_qty")).as("part_qty"))
    perSupp.join(perPart, "l_partkey")
      .filter(col("supp_qty") > col("part_qty") * 0.3)
      .select("l_suppkey").distinct()
      .join(Tables.supplier(spark, dir).select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select("s_suppkey", "s_name")
      .orderBy(col("s_suppkey"))
  }

  /** RFM customer segmentation — the classic recency/frequency/monetary
    * quintile scoring behind every CRM audience cut. The engine-exact
    * part is the QUINTILES: `ntile` differs across engines on remainder
    * placement, so each score is integer arithmetic on a global rank
    * (`5 − ((rank−1)·5 div n)`) — and each rank rides the two-phase
    * range-partitioned cumsum ([[CorpusOps.keyedCumsum]]), so no
    * unpartitioned window ever sees the customer relation (at 1e8
    * customers a global `row_number` is a one-task sort; the cumsum's
    * parallelism scales with data). Three orderings are FUSED into one
    * multi-axis pass (VERDICT r8 stretch): each customer unpivots to
    * three (axis, sort value) rows — negation turns the two descending
    * axes ascending, exact for counts and 2-dp-rounded monetary — and
    * a SINGLE keyed cumsum over `axis` ranks all three relations in
    * one range exchange; a customer-keyed aggregation folds the ranks
    * back to one row. One exchange + one shuffle instead of three
    * chained exchange/window/broadcast rounds.
    */
  def qRfmSegmentation(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val ref = orders.agg(max(col("o_orderdate")).as("ref_date"))
    val cust = orders.groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"),
        round(sum(col("o_totalprice")), 2).as("monetary"))
      .crossJoin(broadcast(ref))
      .withColumn("recency_days",
        datediff(col("ref_date"), col("last_order")).cast("long"))
      .drop("ref_date", "last_order")
    val axes = cust
      .withColumn("ax", explode(array(
        struct(lit("r").as("axis"), col("recency_days").cast("double").as("sv")),
        struct(lit("f").as("axis"), (-col("frequency")).cast("double").as("sv")),
        struct(lit("m").as("axis"), (-col("monetary")).cast("double").as("sv")))))
      .select(col("o_custkey"), col("recency_days"), col("frequency"),
        col("monetary"), col("ax.axis").as("axis"), col("ax.sv").as("sv"))
      .withColumn("_one", lit(1L))
    val ranked = CorpusOps.keyedCumsum(
        axes, "axis", Seq(col("sv"), col("o_custkey")), "_one", "rank")
      .groupBy(col("o_custkey"))
      .agg(max(col("recency_days")).as("recency_days"),
        max(col("frequency")).as("frequency"),
        max(col("monetary")).as("monetary"),
        max(when(col("axis") === "r", col("rank"))).as("r_rank"),
        max(when(col("axis") === "f", col("rank"))).as("f_rank"),
        max(when(col("axis") === "m", col("rank"))).as("m_rank"))
    val n = orders.select(col("o_custkey")).distinct()
      .agg(count(lit(1)).as("n"))
    val scored = ranked.crossJoin(broadcast(n))
      .withColumn("r_score", lit(5) - expr("(r_rank - 1) * 5 div n"))
      .withColumn("f_score", lit(5) - expr("(f_rank - 1) * 5 div n"))
      .withColumn("m_score", lit(5) - expr("(m_rank - 1) * 5 div n"))
    scored.select(
        col("o_custkey"), col("recency_days"), col("frequency"),
        col("monetary"), col("r_score"), col("f_score"), col("m_score"),
        when(col("r_score") >= 4 && col("f_score") >= 4 && col("m_score") >= 4,
            "champion")
          .when(col("f_score") >= 4 && col("r_score") >= 3, "loyal")
          .when(col("m_score") >= 4 && col("r_score") >= 3, "big_spender")
          .when(col("r_score") <= 2 &&
            (col("f_score") >= 3 || col("m_score") >= 3), "at_risk")
          .when(col("r_score") <= 2, "hibernating")
          .otherwise("regular").as("segment"))
      .orderBy(col("o_custkey"))
  }

  /** Market-basket association pairs with support and lift — the
    * co-occurrence analysis under every "frequently bought together"
    * feature (Agrawal-style association rules, restricted to pairs).
    * The pair explosion is bounded by brands-per-order (≤ 25 here, and
    * small in any real basket), NEVER by catalog × catalog: the
    * self-join is keyed on the order, so candidate volume is
    * Σ_orders b·(b−1)/2. Supports and the lift normalizer are grouped
    * counts plus one 1-row broadcast total.
    */
  def qBasketLift(spark: SparkSession, dir: String): DataFrame = {
    // no broadcast hint: part scales with SF (same no-hint-on-scaling-dims
    // discipline as q3/q5 — CBO/AQE picks broadcast while it fits)
    // read 3x: pair self-join (both sides) + brand counts. The
    // checkpoint is CLUSTERED ON okey: hash(okey) satisfies the
    // (okey, brand) distinct (subset rule), so the distinct itself adds
    // no second exchange, and both self-join sides leave the checkpoint
    // identically partitioned. Measured at 32 cores: total shuffle
    // bytes 19.8 → 18.7 MB read / 13.9 → 12.9 MB write (deterministic),
    // wall within noise. NOTE the self-join's visible exchanges remain:
    // localCheckpoint under AQE publishes UnknownPartitioning to the
    // logical plan (plans/r16/q_basket_lift_*.txt), so the clustering
    // is physical, not planner-visible — full exchange elimination here
    // needs a partitioning-preserving checkpoint, left for a future
    // round.
    val items = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("okey"), col("p_brand").as("brand"))
      .repartition(col("okey"))
      .distinct()
      .localCheckpoint()
    val nOrders = items.select("okey").distinct().agg(count(lit(1)).as("n_orders"))
    val brandCnt = items.groupBy("brand").agg(count(lit(1)).as("n_brand"))
    val pairs = items.select(col("okey"), col("brand").as("brand_a"))
      .join(items.select(col("okey"), col("brand").as("brand_b")), "okey")
      .filter(col("brand_a") < col("brand_b"))
      .groupBy("brand_a", "brand_b").agg(count(lit(1)).as("n_both"))
    pairs
      .join(brandCnt.select(col("brand").as("brand_a"), col("n_brand").as("n_a")),
        "brand_a")
      .join(brandCnt.select(col("brand").as("brand_b"), col("n_brand").as("n_b")),
        "brand_b")
      .crossJoin(broadcast(nOrders))
      .withColumn("support", round(col("n_both") / col("n_orders"), 6))
      // double-cast BEFORE the products: n_both·n_orders as Long·Long
      // wraps silently at ~1e11-order scale (DuckDB would error); the
      // oracle casts at the same spot so both engines evaluate
      // (double·double)/(double·double)
      .withColumn("lift",
        round(col("n_both").cast("double") * col("n_orders").cast("double")
          / (col("n_a").cast("double") * col("n_b").cast("double")), 6))
      .select("brand_a", "brand_b", "n_both", "support", "lift")
      .orderBy("brand_a", "brand_b")
  }

  /** TPC-H Q18-style large-volume customers — closing the classic 22:
    * orders whose total quantity exceeds 300 units, enriched with
    * customer identity, top 100 by order value. The reference Q18 text
    * re-joins lineitem and re-groups after the IN-subquery; since the
    * having-clause aggregate IS the output payload, the plan here
    * aggregates lineitem ONCE on l_orderkey (map-side partials) and
    * joins the filtered aggregate to orders/customer directly — one
    * lineitem scan instead of two, no IN-subquery rewrite for Catalyst
    * to de-correlate. The >300 filter cuts the aggregate to a sliver
    * before either join, so at 100 TB the joins see thousands of rows,
    * not billions. `l_quantity` is integral in this corpus, so the
    * double sum is exact and order-free (no rounding discipline
    * needed); total output order via the (price, date, orderkey)
    * tiebreak before the limit.
    */
  def q18LargeVolumeCustomers(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 300)
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
      .limit(100)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_large_volume_customers" -> (q18LargeVolumeCustomers _),
    "q_moving_corr"        -> (qMovingCorr _),
    "q_yoy_growth"         -> (qYoyGrowth _),
    "q_abc_analysis"       -> (qAbcAnalysis _),
    "q_rfm_segmentation"   -> (qRfmSegmentation _),
    "q_basket_lift"        -> (qBasketLift _),
    "q13_custdist"         -> (q13CustDist _),
    "q6_forecast_revenue"  -> (q6ForecastRevenue _),
    "q8_market_share"      -> (q8MarketShare _),
    "q9_profit_by_nation"  -> (q9ProfitByNation _),
    "q10_returned_items"   -> (q10ReturnedItems _),
    "q11_important_parts"  -> (q11ImportantParts _),
    "q12_ship_priority"    -> (q12ShipPriority _),
    "q14_promo_share"      -> (q14PromoShare _),
    "q16_supplier_variety" -> (q16SupplierVariety _),
    "q17_small_qty_revenue" -> (q17SmallQtyRevenue _),
    "q19_disjunctive_revenue" -> (q19DisjunctiveRevenue _),
    "q20_top_part_suppliers" -> (q20TopPartSuppliers _),
    "q15_top_supplier"     -> (q15TopSupplier _),
    "q21_sole_late_supplier" -> (q21SoleLateSupplier _),
    "q2_min_price_supplier" -> (q2MinPriceSupplier _),
    "q22_dormant_customers" -> (q22DormantCustomers _),
    "q7_bination_volume"   -> (q7BiNationVolume _),
    "q4_order_priority"    -> (q4OrderPriority _),
    "q_brand_premium"      -> (brandPremium _),
    "q_large_orders"       -> (largeOrders _),
    "q_trailing_7d"        -> (trailingRevenue7d _),
    "q_customer_deciles"   -> (customerDeciles _),
    "q_cube"               -> (cubeSummary _),
    "q_grouping_sets"      -> (groupingSetsSummary _),
    "q_running_revenue"    -> (runningRevenue _),
    "q_price_band_join"    -> (priceBandJoin _),
    "q_price_band_join_topk" -> (priceBandJoinTopk _),
    "q1_pricing_summary"   -> (q1PricingSummary _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q5_region_revenue"    -> (q5RegionRevenue _),
    "q_top_parts_per_brand" -> (topPartsPerBrand _),
    "q_rollup"             -> (rollupSummary _),
    "q_orders_enriched"    -> (ordersEnriched _),
    "q_salted_skew_join"   -> (saltedSkewJoin _))

  val oracles: Map[String, String] = Map(
    "q_abc_analysis" ->
      """WITH pp AS (
        |  SELECT l_partkey,
        |    round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |  FROM lineitem GROUP BY 1),
        |sc AS (SELECT *, CAST(round(revenue * 10000, 0) AS BIGINT) AS rev4 FROM pp),
        |cum AS (
        |  SELECT *, sum(rev4) OVER (
        |      ORDER BY rev4 DESC, l_partkey ROWS UNBOUNDED PRECEDING) AS cum4,
        |    (SELECT sum(rev4) FROM sc) AS total4
        |  FROM sc)
        |SELECT l_partkey, revenue,
        |  round(cum4 / 10000.0, 4) AS cum_revenue,
        |  round(cum4 / total4, 6) AS cum_share,
        |  CASE WHEN cum4 * 100 <= total4 * 80 THEN 'A'
        |       WHEN cum4 * 100 <= total4 * 95 THEN 'B'
        |       ELSE 'C' END AS abc_class
        |FROM cum ORDER BY cum_revenue, l_partkey""".stripMargin,
    "q_yoy_growth" ->
      """WITH yearly AS (
        |  SELECT p.p_brand, year(l.l_shipdate) AS yr,
        |    round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |  GROUP BY 1, 2),
        |lagged AS (
        |  SELECT *, lag(revenue) OVER w AS prev_revenue,
        |    lag(yr) OVER w AS prev_yr
        |  FROM yearly
        |  WINDOW w AS (PARTITION BY p_brand ORDER BY yr))
        |SELECT p_brand, yr, revenue, prev_revenue,
        |  CASE WHEN prev_yr = yr - 1 AND prev_revenue > 0 THEN
        |    round((revenue - prev_revenue) / prev_revenue, 6) END AS yoy_growth
        |FROM lagged ORDER BY p_brand, yr""".stripMargin,
    "q_moving_corr" ->
      """WITH daily AS (
        |  SELECT CAST(l_shipdate AS DATE) AS ship_date,
        |    CAST(sum(l_quantity) AS BIGINT) AS x,
        |    CAST(round(sum(l_extendedprice * (1 - l_discount)), 0) AS BIGINT) AS y
        |  FROM lineitem GROUP BY 1),
        |win AS (
        |  SELECT ship_date, x, y,
        |    count(*) OVER w AS n,
        |    sum(x) OVER w AS sx, sum(y) OVER w AS sy,
        |    sum(x * y) OVER w AS sxy,
        |    sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy
        |  FROM daily
        |  WINDOW w AS (ORDER BY ship_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT ship_date, x AS units, y AS revenue_units, n AS n_days,
        |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
        |    round(CAST(n * sxy - sx * sy AS DOUBLE)
        |      / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |         * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
        |  END AS corr_7d
        |FROM win ORDER BY ship_date""".stripMargin,
    "q18_large_volume_customers" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
        |FROM big
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        |LIMIT 100""".stripMargin,
    "q_rfm_segmentation" ->
      """WITH cust AS (
        |  SELECT o_custkey,
        |    date_diff('day', max(o_orderdate),
        |      (SELECT max(o_orderdate) FROM orders)) AS recency_days,
        |    count(*) AS frequency,
        |    round(sum(o_totalprice), 2) AS monetary
        |  FROM orders GROUP BY o_custkey),
        |ranked AS (
        |  SELECT *,
        |    row_number() OVER (ORDER BY recency_days, o_custkey) AS r_rank,
        |    row_number() OVER (ORDER BY frequency DESC, o_custkey) AS f_rank,
        |    row_number() OVER (ORDER BY monetary DESC, o_custkey) AS m_rank,
        |    count(*) OVER () AS n
        |  FROM cust),
        |scored AS (
        |  SELECT o_custkey, recency_days, frequency, monetary,
        |    5 - ((r_rank - 1) * 5) // n AS r_score,
        |    5 - ((f_rank - 1) * 5) // n AS f_score,
        |    5 - ((m_rank - 1) * 5) // n AS m_score
        |  FROM ranked)
        |SELECT o_custkey, recency_days, frequency, monetary,
        |  r_score, f_score, m_score,
        |  CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
        |       WHEN f_score >= 4 AND r_score >= 3 THEN 'loyal'
        |       WHEN m_score >= 4 AND r_score >= 3 THEN 'big_spender'
        |       WHEN r_score <= 2 AND (f_score >= 3 OR m_score >= 3) THEN 'at_risk'
        |       WHEN r_score <= 2 THEN 'hibernating'
        |       ELSE 'regular' END AS segment
        |FROM scored ORDER BY o_custkey""".stripMargin,
    "q_basket_lift" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |n_orders AS (SELECT count(DISTINCT okey) AS n_orders FROM items),
        |brand_cnt AS (SELECT brand, count(*) AS n_brand FROM items GROUP BY brand),
        |pairs AS (
        |  SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS n_both
        |  FROM items a JOIN items b ON a.okey = b.okey AND a.brand < b.brand
        |  GROUP BY 1, 2)
        |SELECT brand_a, brand_b, n_both,
        |  round(n_both / (SELECT n_orders FROM n_orders), 6) AS support,
        |  round(CAST(n_both AS DOUBLE) * CAST((SELECT n_orders FROM n_orders) AS DOUBLE)
        |    / (CAST(ca.n_brand AS DOUBLE) * CAST(cb.n_brand AS DOUBLE)), 6) AS lift
        |FROM pairs
        |JOIN brand_cnt ca ON brand_a = ca.brand
        |JOIN brand_cnt cb ON brand_b = cb.brand
        |ORDER BY brand_a, brand_b""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  round(sum(CASE WHEN sn.n_name = 'NATION_5'
        |              THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        |        / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region ON cn.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE r_name = 'AMERICA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY o_year""".stripMargin,
    "q9_profit_by_nation" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_type = 'STANDARD'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q11_important_parts" ->
      """WITH per_part AS (
        |  SELECT l_partkey,
        |    round(sum(l_extendedprice * (1 - l_discount)), 4) AS part_value
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'
        |  GROUP BY 1)
        |SELECT l_partkey AS p_partkey, part_value
        |FROM per_part
        |WHERE part_value > (
        |  SELECT round(sum(part_value) * 0.001, 6) FROM per_part)
        |ORDER BY part_value DESC, p_partkey""".stripMargin,
    "q12_ship_priority" ->
      """WITH banded AS (
        |  SELECT o_orderpriority,
        |    CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN '0-30'
        |         WHEN date_diff('day', o_orderdate, l_shipdate) <= 60 THEN '31-60'
        |         WHEN date_diff('day', o_orderdate, l_shipdate) <= 90 THEN '61-90'
        |         ELSE '90+' END AS delay_band
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT delay_band,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |       THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM banded GROUP BY delay_band ORDER BY delay_band""".stripMargin,
    "q14_promo_share" ->
      """SELECT round(100 * sum(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        |  / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin,
    "q16_supplier_variety" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM ps JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q17_small_qty_revenue" ->
      """WITH sel AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#3' AND p_type = 'MEDIUM')
        |SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
        |FROM (SELECT *, avg(l_quantity) OVER (PARTITION BY l_partkey) * 0.2
        |        AS qty_thresh FROM sel) t
        |WHERE l_quantity < qty_thresh""".stripMargin,
    "q19_disjunctive_revenue" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q20_top_part_suppliers" ->
      """WITH per_supp AS (
        |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_type = 'PROMO'
        |    AND l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1, 2),
        |per_part AS (
        |  SELECT l_partkey, sum(supp_qty) AS part_qty
        |  FROM per_supp GROUP BY 1),
        |heavy AS (
        |  SELECT DISTINCT l_suppkey
        |  FROM per_supp JOIN per_part USING (l_partkey)
        |  WHERE supp_qty > part_qty * 0.3)
        |SELECT s_suppkey, s_name
        |FROM heavy JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY s_suppkey""".stripMargin,
    "q21_sole_late_supplier" ->
      """WITH ls AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
        |multi AS (SELECT l_orderkey FROM ls GROUP BY 1 HAVING count(*) > 1),
        |late AS (
        |  SELECT DISTINCT l.l_orderkey, l.l_suppkey
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY),
        |cand AS (
        |  SELECT late.l_orderkey, late.l_suppkey
        |  FROM late JOIN multi USING (l_orderkey)),
        |sole AS (
        |  SELECT c.l_orderkey, c.l_suppkey FROM cand c
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM late x
        |    WHERE x.l_orderkey = c.l_orderkey
        |      AND x.l_suppkey <> c.l_suppkey))
        |SELECT s.s_suppkey, s.s_name, count(*) AS numwait
        |FROM sole JOIN supplier s ON s.s_suppkey = sole.l_suppkey
        |GROUP BY 1, 2 ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin,
    "q2_min_price_supplier" ->
      """WITH unit AS (
        |  SELECT l_partkey, l_suppkey,
        |    round(l_extendedprice / l_quantity, 6) AS unit_price
        |  FROM lineitem),
        |per_supp AS (
        |  SELECT l_partkey, l_suppkey, min(unit_price) AS supp_min
        |  FROM unit GROUP BY 1, 2),
        |ranked AS (
        |  SELECT *, rank() OVER (
        |    PARTITION BY l_partkey ORDER BY supp_min) AS rk
        |  FROM per_supp)
        |SELECT r.l_partkey AS p_partkey, s.s_suppkey, s.s_name,
        |  r.supp_min AS best_price
        |FROM ranked r
        |JOIN supplier s ON s.s_suppkey = r.l_suppkey
        |WHERE r.rk = 1
        |ORDER BY p_partkey, s_suppkey""".stripMargin,
    "q13_custdist" ->
      """WITH co AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |SELECT c_count, count(*) AS custdist
        |FROM co GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_rev
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q22_dormant_customers" ->
      """WITH avg_bal AS (
        |  SELECT round(avg(c_acctbal), 6) AS abal FROM customer WHERE c_acctbal > 0),
        |recent AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1999-01-01')
        |SELECT c_nationkey, count(*) AS n_dormant,
        |  round(sum(c_acctbal), 2) AS total_bal
        |FROM customer
        |WHERE c_acctbal > (SELECT abal FROM avg_bal)
        |  AND NOT EXISTS (SELECT 1 FROM recent WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
    "q7_bination_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((sn.n_name = 'NATION_10' AND cn.n_name = 'NATION_12')
        |    OR (sn.n_name = 'NATION_12' AND cn.n_name = 'NATION_10'))
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // the correlated scalar subquery is the SPEC; the Spark plan is its
    // decorrelated agg+broadcast-join form
    "q_brand_premium" ->
      """WITH avgb AS (
        |  SELECT p_brand, round(avg(p_retailprice), 6) AS brand_avg
        |  FROM part GROUP BY p_brand)
        |SELECT p_partkey, p_brand, p_retailprice, brand_avg,
        |  round(p_retailprice / brand_avg, 6) AS premium_ratio,
        |  round(p_retailprice / brand_avg, 6) > 1.05 AS is_premium
        |FROM part JOIN avgb USING (p_brand)
        |ORDER BY p_partkey""".stripMargin,
    "q_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING round(sum(l_quantity), 2) > 260)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey""".stripMargin,
    "q_trailing_7d" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  round(sum(o_totalprice) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY date_diff('day', TIMESTAMP '1992-01-01', o_orderdate)
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS trailing_7d
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q_customer_deciles" ->
      """WITH rev AS (
        |  SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue
        |  FROM orders GROUP BY o_custkey)
        |SELECT n_name, c_custkey AS custkey, revenue,
        |  ntile(10) OVER w AS decile,
        |  round(percent_rank() OVER w, 6) AS pct_rank
        |FROM rev
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WINDOW w AS (PARTITION BY n_name ORDER BY revenue DESC, c_custkey)
        |ORDER BY n_name, custkey""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_top_parts_per_brand" ->
      """SELECT p_partkey, p_name, p_brand, p_retailprice, rank_in_brand FROM (
        |  SELECT p_partkey, p_name, p_brand, p_retailprice,
        |    row_number() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC, p_partkey) AS rank_in_brand
        |  FROM part) t
        |WHERE rank_in_brand <= 3
        |ORDER BY p_brand, rank_in_brand""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS n_rows,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY coalesce(l_returnflag, '~'), coalesce(l_linestatus, '~')""".stripMargin,
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g_flag,
        |  count(*) AS n_rows,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus))
        |ORDER BY coalesce(l_returnflag, '~'), coalesce(l_linestatus, '~'), g_flag""".stripMargin,
    "q_orders_enriched" ->
      """SELECT o_orderkey, c_name, c_mktsegment, o_totalprice,
        |  CASE WHEN substr(o_orderpriority, 1, 1) IN ('1', '2')
        |       THEN 'urgent' ELSE 'normal' END AS priority_class
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY coalesce(l_returnflag, '~'), coalesce(l_linestatus, '~')""".stripMargin,
    "q_running_revenue" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING), 4) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    // banding is result-invisible: the oracle is the plain range join
    "q_price_band_join" ->
      """SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
        |  a.p_retailprice AS price_a, b.p_retailprice AS price_b,
        |  round(abs(a.p_retailprice - b.p_retailprice), 6) AS price_diff
        |FROM part a JOIN part b
        |  ON a.p_partkey < b.p_partkey
        |  AND abs(a.p_retailprice - b.p_retailprice) <= 0.5
        |ORDER BY key_a, key_b""".stripMargin,
    // the collapse is result-invisible: the oracle is the plain range
    // join ranked per source key — the directed kNN lists checked
    // value-for-value
    "q_price_band_join_topk" ->
      s"""WITH cand AS (
         |  SELECT a.p_partkey AS u, b.p_partkey AS v,
         |    a.p_retailprice AS price_u, b.p_retailprice AS price_v,
         |    round(abs(a.p_retailprice - b.p_retailprice), 6) AS diff
         |  FROM part a JOIN part b
         |    ON a.p_partkey < b.p_partkey
         |    AND abs(a.p_retailprice - b.p_retailprice) <= 0.5),
         |sym AS (SELECT u, v, price_u, price_v, diff FROM cand
         |        UNION ALL SELECT v, u, price_v, price_u, diff FROM cand),
         |ranked AS (SELECT *, row_number() OVER (
         |    PARTITION BY u ORDER BY diff, v) AS rank FROM sym)
         |SELECT u AS key, v AS neighbor, price_u, price_v,
         |  diff AS price_diff, rank
         |FROM ranked WHERE rank <= ${GraphOps.KnnK}
         |ORDER BY key, rank""".stripMargin,
    // salting is result-invisible: the oracle is the plain equi-join
    "q_salted_skew_join" ->
      """SELECT s_nationkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)
}

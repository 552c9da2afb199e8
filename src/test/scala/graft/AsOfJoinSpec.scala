package graft

import graft.operators.Events
import graft.plans.{AsOfJoin, AsOfJoinExec}
import org.apache.spark.sql.classic.{Dataset => CDataset}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Native merge as-of join: the custom LogicalPlan + SparkStrategy +
  * SparkPlan tier.
  */
class AsOfJoinSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  private def executedPlan(df: org.apache.spark.sql.DataFrame) = {
    df.write.format("noop").mode("overwrite").save() // finalize AQE
    df.queryExecution.executedPlan
  }

  test("native as-of join equals the composed union+window formulation") {
    val native = Events.eventsAsofNative(spark, sfDir).collect().toSeq
    val composed = Events.eventsAsofJoin(spark, sfDir).collect().toSeq
    assert(native.nonEmpty)
    assert(native == composed)
  }

  test("plan: AsOfJoinExec present, exactly one shuffle per side, no window, no union") {
    val df = Events.eventsAsofNative(spark, sfDir)
    val plan = executedPlan(df)
    val asofs = collect(plan) { case e: AsOfJoinExec => e }
    assert(asofs.size == 1, s"expected one AsOfJoinExec in:\n$plan")
    // the as-of node's own inputs: one hash exchange per side (the
    // final orderBy adds a range exchange above — excluded by scoping
    // the count to the join subtree)
    val joinSubtree = asofs.head
    val shuffles = collect(joinSubtree) { case s: ShuffleExchangeExec => s }
    assert(shuffles.size == 2, s"expected 2 shuffles under the join in:\n$joinSubtree")
    val windows = collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.isEmpty, "native path must not fall back to a window")
  }

  test("inner semantics: purchases before any click are dropped; outer keeps them with nulls") {
    import spark.implicits._
    val clicks = Seq((1L, 100L, 10L), (1L, 200L, 11L), (2L, 500L, 20L))
      .toDF("c_user", "c_t", "c_id")
    val purchases = Seq(
      (1L, 150L, 900L),  // after click 10, before 11 → matches 10
      (1L, 200L, 901L),  // equal ts → matches 11 (at-or-before)
      (2L, 400L, 902L),  // before user 2's only click → no match
      (3L, 999L, 903L))  // user with no clicks at all → no match
      .toDF("user_id", "p_t", "p_id")
    def run(outer: Boolean) = AsOfJoin.join(
        purchases, clicks,
        Seq(purchases.col("user_id")), Seq(clicks.col("c_user")),
        purchases.col("p_t"), clicks.col("c_t"),
        rightTiebreak = Seq(clicks.col("c_id")), outer = outer)
      .select("p_id", "user_id", "c_id")
      .orderBy("p_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSeq
    assert(run(outer = false) == Seq((900L, 1L, 10L), (901L, 1L, 11L)))
    assert(run(outer = true) == Seq(
      (900L, 1L, 10L), (901L, 1L, 11L), (902L, 2L, -1L), (903L, 3L, -1L)))
  }

  test("equal right timestamps: the max tiebreak wins") {
    import spark.implicits._
    val clicks = Seq((1L, 100L, 7L), (1L, 100L, 9L), (1L, 100L, 8L))
      .toDF("c_user", "c_t", "c_id")
    val purchases = Seq((1L, 100L, 900L)).toDF("user_id", "p_t", "p_id")
    val out = AsOfJoin.join(
        purchases, clicks,
        Seq(purchases.col("user_id")), Seq(clicks.col("c_user")),
        purchases.col("p_t"), clicks.col("c_t"),
        rightTiebreak = Seq(clicks.col("c_id")))
      .select("c_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("null keys never match (SQL join equality), even against null-key right rows") {
    import spark.implicits._
    val clicks = Seq(
      (Some(1L), 100L, 10L), (None, 50L, 11L), (None, 60L, 12L))
      .toDF("c_user", "c_t", "c_id")
    val purchases = Seq(
      (Some(1L), 200L, 900L), (None, 200L, 901L))
      .toDF("user_id", "p_t", "p_id")
    def run(outer: Boolean) = AsOfJoin.join(
        purchases, clicks,
        Seq(purchases.col("user_id")), Seq(clicks.col("c_user")),
        purchases.col("p_t"), clicks.col("c_t"),
        rightTiebreak = Seq(clicks.col("c_id")), outer = outer)
      .select("p_id", "c_id").orderBy("p_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    // inner: the null-key purchase is dropped; the null-key clicks match nothing
    assert(run(outer = false) == Seq((900L, 10L)))
    // outer: the null-key purchase survives with a null right side
    assert(run(outer = true) == Seq((900L, 10L), (901L, -1L)))
  }

  test("empty right side: inner empty, outer all-null right") {
    import spark.implicits._
    val clicks = Seq.empty[(Long, Long, Long)].toDF("c_user", "c_t", "c_id")
    val purchases = Seq((1L, 100L, 900L), (2L, 50L, 901L)).toDF("user_id", "p_t", "p_id")
    def join(outer: Boolean) = AsOfJoin.join(
      purchases, clicks,
      Seq(purchases.col("user_id")), Seq(clicks.col("c_user")),
      purchases.col("p_t"), clicks.col("c_t"), outer = outer)
    assert(join(outer = false).count() == 0)
    val outer = join(outer = true).orderBy("p_id").collect()
    assert(outer.length == 2 && outer.forall(_.isNullAt(5)))
  }

  test("schema nullability: only the outer form widens the right side") {
    import spark.implicits._
    val clicks = Seq((1L, 10L, 7L)).toDF("c_user", "c_t", "c_id")
    val purchases = Seq((1L, 100L, 900L)).toDF("user_id", "p_t", "p_id")
    def join(outer: Boolean) = AsOfJoin.join(
      purchases, clicks,
      Seq(purchases.col("user_id")), Seq(clicks.col("c_user")),
      purchases.col("p_t"), clicks.col("c_t"), outer = outer)
    val innerRight = join(outer = false).schema.fields.drop(3)
    val outerRight = join(outer = true).schema.fields.drop(3)
    assert(innerRight.forall(!_.nullable),
      "inner as-of join must not widen right-side nullability")
    assert(outerRight.forall(_.nullable),
      "outer as-of join must report nullable right-side columns")
  }
}

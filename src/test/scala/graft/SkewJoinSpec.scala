package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** AQE skew-join splitting — the runtime half of the repo's skew
  * story (the static half is `q_salted_skew_join`): when one join key
  * dominates, OptimizeSkewedJoin splits the oversized partition into
  * per-split tasks and replicates the matching side, without changing
  * results. The spec lowers the skew thresholds so the driver-scale
  * data triggers the same path a 100 TB hot key would.
  */
class SkewJoinSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed partition and preserves the join result") {
    import spark.implicits._
    // one hot key carrying ~90% of the fact side
    val fact = spark.range(0, 60000)
      .select(
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 1000).as("k"),
        col("id").as("payload"))
    val dim = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("attr"))
    val q = fact.join(dim, "k")
    val (skewHandled, rows) = withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB") {
      // collect() runs q's OWN QueryExecution (count()/write()/foreach
      // all plan separate executions), so AQE finalizes THIS plan —
      // and the runtime skew marking with it
      val n = q.collect().length.toLong
      val smj = collect(q.queryExecution.executedPlan) {
        case j: SortMergeJoinExec => j }
      (smj.exists(_.isSkewJoin), n)
    }
    assert(skewHandled, "OptimizeSkewedJoin did not mark the join as skew-handled")
    // identical result without any skew handling
    val plain = withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "false") { q.count() }
    assert(rows == plain && rows == 60000L)
  }
}

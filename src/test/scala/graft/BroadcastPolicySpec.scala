package graft

import graft.operators.CoreAnalytics
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}

/** SURVEY §4's broadcast policy, asserted: only provably bounded dims
  * (region 5 rows, nation 25) carry an explicit `broadcast()` hint;
  * tables that scale with the data (customer, supplier) are left to
  * the cost model. So when broadcasting is impossible — the 100 TB
  * regime, simulated by `autoBroadcastJoinThreshold = -1` — the
  * bounded dims STILL broadcast (the hint survives) while the scaling
  * sides degrade to shuffle joins instead of OOMing the executors.
  */
class BroadcastPolicySpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  private def joins(thresh: String): (Int, Int) = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    try {
      val plan = CoreAnalytics.q5RegionRevenue(spark, sfDir)
        .queryExecution.executedPlan
      (collect(plan) { case b: BroadcastHashJoinExec => b }.size,
        collect(plan) { case s: SortMergeJoinExec => s }.size)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q5: bounded dims keep broadcasting when auto-broadcast is off; big sides degrade to shuffle joins") {
    val (bhjOff, smjOff) = joins("-1")
    // the two HINTED bounded dims (nation, region) still broadcast
    assert(bhjOff >= 2, s"hinted bounded dims lost their broadcast: $bhjOff")
    // customer/supplier/orders joins degraded to shuffle joins, not OOM
    assert(smjOff >= 2, s"expected scaling-side joins to degrade to SMJ, got $smjOff")
    // and under default thresholds the small test dims all broadcast
    val (bhjOn, _) = joins("10MB")
    assert(bhjOn >= bhjOff)
  }
}

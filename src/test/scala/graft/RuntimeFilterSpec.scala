package graft

import org.apache.spark.sql.functions._

/** Spark's runtime bloom-filter join pruning (injected by
  * `InjectRuntimeFilter`): a selective filter on one join side builds a
  * bloom filter that is pushed into the OTHER side's scan as
  * `might_contain`, so the big side drops non-joining rows BEFORE the
  * shuffle. At 100 TB this is the difference between shuffling the
  * whole fact table and shuffling the ~join-selectivity fraction of
  * it; the default size thresholds (creation side <= 10 MB, application
  * side >= 10 GB) mean it arms itself exactly in the big-cluster regime
  * this library targets. Test data is far below those thresholds, so
  * the spec lowers them to prove the mechanism fires and preserves
  * results.
  */
class RuntimeFilterSpec extends SparkTestBase {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("a selective dim filter injects might_contain into the fact side") {
    val joined = withConf(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val li = Tables.lineitem(spark, sfDir).select("l_partkey", "l_quantity")
      val dim = Tables.part(spark, sfDir)
        .filter(col("p_brand") === "Brand#11") // selective creation side
        .select("p_partkey")
      val q = li.join(dim, col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey")).agg(sum(col("l_quantity")).as("qty"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"runtime bloom filter did not arm:\n$optimized")
      q
    }
    // and the filtered plan returns exactly the un-filtered result
    val li = Tables.lineitem(spark, sfDir).select("l_partkey", "l_quantity")
    val dim = Tables.part(spark, sfDir)
      .filter(col("p_brand") === "Brand#11").select("p_partkey")
    val expected = li.join(dim, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey")).agg(sum(col("l_quantity")).as("qty"))
    assert(joined.orderBy("l_partkey").collect().toSeq ==
      expected.orderBy("l_partkey").collect().toSeq)
  }

  test("bloom filter does not arm when the creation side is not selective") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val li = Tables.lineitem(spark, sfDir).select("l_partkey", "l_quantity")
      val dim = Tables.part(spark, sfDir).select("p_partkey") // no filter
      val q = li.join(dim, col("l_partkey") === col("p_partkey"))
      assert(!q.queryExecution.optimizedPlan.toString.contains("might_contain"))
    }
  }
}

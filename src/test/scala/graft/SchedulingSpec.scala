package graft

import graft.operators.EtlScheduling
import org.apache.spark.sql.functions._

/** Semantics of the schedule-allocation and keyset-export operators
  * (reference repo.py:68-140 / apiclient.py:609-713).
  */
class SchedulingSpec extends SparkTestBase {

  test("allocation: at most 10 bounded jobs, contiguous positions, count tags correct") {
    val a = EtlScheduling.jobAllocation(spark, sfDir).cache()
    assert(a.count() > 0)
    val jobs = a.groupBy("job_number", "run_key", "product_count")
      .agg(count(lit(1)).as("n"), countDistinct("business").as("nb"),
        min("pos_in_job").as("lo"), max("pos_in_job").as("hi"))
      .collect()
    assert(jobs.length <= 10)
    jobs.foreach { j =>
      assert(j.getAs[Long]("n") <= 25L)                      // bounded batch
      assert(j.getAs[Long]("n") == j.getAs[Long]("product_count")) // tag == reality
      assert(j.getAs[Long]("nb") == 1L)                      // one business per job
      assert(j.getAs[Long]("lo") == 0L)                      // positions contiguous
      assert(j.getAs[Long]("hi") == j.getAs[Long]("n") - 1)
    }
    a.unpersist()
  }

  test("allocation run keys are idempotent: a re-evaluated schedule dedups to zero new runs") {
    // Dagster skips RunRequests whose run_key was already used
    // (repo.py:107: run_key = f"{schedule_run_id}_job_{job_number:02d}")
    // — so two evaluations over the same pending set must produce the
    // same keys, and a key-dedup of the second pass schedules nothing
    val first = EtlScheduling.jobAllocation(spark, sfDir)
      .select("run_key").distinct().collect().map(_.getString(0)).toSet
    val second = EtlScheduling.jobAllocation(spark, sfDir)
      .select("run_key").distinct().collect().map(_.getString(0)).toSet
    assert(first == second)
    assert(second.filterNot(first).isEmpty)
    assert(first.forall(_.matches("img_schedule_0_job_\\d{2}")))
  }

  test("keyset page: cursor predicate is pushed to the scan, sort is a top-k, cost O(limit)") {
    val page = EtlScheduling.productsAfter(spark, sfDir, "Brand#11", 500L, 25)
    val plan = page.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(p_partkey,500)"),
      s"cursor predicate not pushed:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected top-k, not a global sort:\n$plan")
    assert(!plan.contains("GlobalLimit"), s"skip-style limit in plan:\n$plan")
  }

  test("walking keyset cursors reproduces the page ledger exactly") {
    val business = "Brand#11"
    val ledger = EtlScheduling.productsPage(spark, sfDir)
      .filter(col("business") === business)
      .orderBy("page").collect()
    assert(ledger.nonEmpty)
    // client loop: page 0 from the start, then cursor = last_key
    var cursor = 0L
    ledger.zipWithIndex.foreach { case (row, i) =>
      val got = EtlScheduling.productsAfter(spark, sfDir, business, cursor, 25)
        .collect().map(_.getLong(0))
      assert(got.length == row.getAs[Long]("n_products"), s"page $i size")
      assert(got.head == row.getAs[Long]("first_key"), s"page $i first key")
      assert(got.last == row.getAs[Long]("last_key"), s"page $i last key")
      if (i > 0) assert(row.getAs[Long]("cursor") == cursor, s"page $i cursor")
      cursor = got.last
    }
    // the ledger's stop condition matches the client's: final page only
    assert(ledger.init.forall(!_.getAs[Boolean]("is_final")))
    assert(ledger.last.getAs[Boolean]("is_final"))
    // after the final page the cursor fetches nothing
    assert(EtlScheduling.productsAfter(spark, sfDir, business, cursor, 25).count() == 0)
  }

  test("pages: every non-final page is exactly full") {
    val p = EtlScheduling.productsPage(spark, sfDir)
    assert(p.filter(!col("is_final") && col("n_products") =!= 25).count() == 0)
    assert(p.filter(col("n_products") > 25).count() == 0)
    // key ranges never overlap the next page (keyset invariant)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("business")).orderBy(col("page"))
    val bad = p.withColumn("prev_last", lag(col("last_key"), 1).over(w))
      .filter(col("prev_last").isNotNull &&
        (col("first_key") <= col("prev_last") || col("cursor") =!= col("prev_last")))
    assert(bad.count() == 0)
  }
}

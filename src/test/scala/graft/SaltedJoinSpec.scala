package graft

import graft.operators.CoreAnalytics
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkTestBase {

  test("salted skew join returns exactly the plain-join result") {
    val salted = CoreAnalytics.saltedSkewJoin(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val supp = Tables.supplier(spark, sfDir)
    val plain = li.join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      .orderBy(col("s_nationkey"))
    assert(salted.collect().toSeq == plain.collect().toSeq)
  }

  test("fact rows join exactly one dim replica (salt is a partition, not a multiplier)") {
    val total = CoreAnalytics.saltedSkewJoin(spark, sfDir)
      .agg(sum("revenue")).head().getDouble(0)
    val expected = Tables.lineitem(spark, sfDir)
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4))
      .head().getDouble(0)
    assert(math.abs(total - expected) < 1e-2)
  }
}

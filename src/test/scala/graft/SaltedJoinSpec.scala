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

  test("banded range join equals the naive inequality join") {
    val banded = CoreAnalytics.priceBandJoin(spark, sfDir)
    val base = Tables.part(spark, sfDir).select(col("p_partkey"), col("p_retailprice"))
    val naive = base.toDF("key_a", "price_a")
      .crossJoin(base.toDF("key_b", "price_b"))
      .filter(col("key_a") < col("key_b") &&
        abs(col("price_a") - col("price_b")) <= 0.5)
      .select(col("key_a"), col("key_b"), col("price_a"), col("price_b"),
        round(abs(col("price_a") - col("price_b")), 6).as("price_diff"))
      .orderBy(col("key_a"), col("key_b"))
    assert(banded.collect().toSeq == naive.collect().toSeq)
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

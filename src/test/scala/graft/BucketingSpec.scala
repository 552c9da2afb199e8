package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkTestBase {

  test("bucketed join on the bucket key plans without a shuffle exchange") {
    // orphan table dirs from a previous test JVM block CTAS (the fresh
    // in-memory metastore doesn't own them) — clear both layers first
    for (t <- Seq("bkt_part", "bkt_lineitem")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete())
        dir.delete()
      }
    }
    Bucketing.writeBucketed(
      Tables.part(spark, sfDir).select("p_partkey", "p_name", "p_brand"),
      "bkt_part", "p_partkey", 4)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sfDir)
        .select("l_partkey", "l_orderkey", "l_extendedprice"),
      "bkt_lineitem", "l_partkey", 4)

    val joined = Bucketing.bucketedJoin(spark, "bkt_lineitem", "bkt_part",
      "l_partkey", "p_partkey")
    val physical = joined.queryExecution.executedPlan.toString

    // the join itself must not shuffle either side: the only acceptable
    // exchanges would be above the join (there are none in a bare join)
    assert(!physical.contains("ShuffleExchange") && !physical.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$physical")
    // and it returns the same rows as the plain join
    val expected = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .count()
    assert(joined.count() == expected)
  }
}

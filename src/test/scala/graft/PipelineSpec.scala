package graft

import graft.operators.{EtlMatching, Pipeline}
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkTestBase {

  test("end-to-end pipeline: unique doc ids, no already-existing products, consistent match types") {
    val df = Pipeline.endToEnd(spark, sfDir).cache()
    assert(df.count() > 0)
    assert(df.select("doc_id").distinct().count() == df.count())
    // upc-matched docs are master docs, generated ones retailer docs
    assert(df.filter(col("match_type") === "upc" &&
      !col("doc_id").startsWith("m-")).count() == 0)
    assert(df.filter(col("match_type") === "generated" && col("upc").isNotNull).count() == 0)
    // precheck really removed the existing products
    val existing = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("2001-09-01").cast("timestamp"))
      .select(col("l_partkey").as("pk")).distinct()
    val leaked = df
      .withColumn("pk", expr("CAST(substr(doc_id, 3) AS BIGINT)"))
      .join(existing, "pk")
    assert(leaked.count() == 0)
  }

  test("corpus prep: gated, deduped, fingerprint consistent with hash") {
    val df = Pipeline.corpusPrep(spark, sfDir).cache()
    assert(df.count() > 0)
    assert(df.filter(col("n_tokens") < 20).count() == 0)
    // one row per content hash
    assert(df.select("content_hash").distinct().count() == df.count())
    assert(df.filter(
      conv(substring(col("content_hash"), 1, 15), 16, 10).cast("bigint") =!= col("fp60"))
      .count() == 0)
  }

  test("corpus split: deterministic, exhaustive, roughly 80/10/10") {
    val df = Pipeline.corpusSplit(spark, sfDir).cache()
    assert(df.count() == Tables.documents(spark, sfDir).count())
    val again = Pipeline.corpusSplit(spark, sfDir)
    assert(df.exceptAll(again).count() == 0)
    val shares = df.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = shares.values.sum.toDouble
    assert(shares("train") / n > 0.7 && shares("train") / n < 0.9)
    assert(shares.keySet == Set("train", "val", "test"))
  }

  test("corpus_group_split: near-dup clusters never straddle splits") {
    import graft.operators.Dedup
    val gs = Pipeline.corpusGroupSplit(spark, sfDir).cache()
    // exhaustive over the corpus, closed split domain
    assert(gs.count() == Tables.documents(spark, sfDir).count())
    val splits = gs.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    // one split per component — the defining property
    val comp = Dedup.dedupComponents(spark, sfDir).select("doc_id", "component")
    val perCluster = gs.join(comp, "doc_id")
      .groupBy("component").agg(countDistinct("split").as("n_splits"))
    assert(perCluster.filter(col("n_splits") =!= 1).count() == 0)
    // therefore zero leakage across the Jaccard pair relation
    val pairs = Dedup.dedupNgramJaccard(spark, sfDir).select("doc_a", "doc_b")
    val leaked = pairs
      .join(gs.select(col("doc_id").as("doc_a"), col("split").as("split_a")), "doc_a")
      .join(gs.select(col("doc_id").as("doc_b"), col("split").as("split_b")), "doc_b")
      .filter(col("split_a") =!= col("split_b"))
    assert(leaked.count() == 0)
  }

  test("events json kpis: parsed counts never exceed totals") {
    val df = graft.operators.Events.eventsJsonKpis(spark, sfDir)
    assert(df.filter(col("n_parsed") > col("n_events")).count() == 0)
    assert(df.count() == 5) // one row per event type
  }

  test("end-to-end pipeline deduplicates on (name, price)") {
    val df = Pipeline.endToEnd(spark, sfDir)
    val dupes = df.groupBy("product_name", "price").count().filter(col("count") > 1)
    assert(dupes.count() == 0)
  }
}

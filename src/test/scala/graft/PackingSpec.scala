package graft

import graft.operators.CorpusOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.window.WindowExec

/** Scale guards for the two-phase keyed cumsum (`CorpusOps.keyedCumsum`)
  * behind the packing family (`corpus_pack_contexts`,
  * `corpus_token_budget`, `multimodal_shard_pack`). The naive form —
  * one window partitioned by source/modality — is correct but its
  * parallelism equals the KEY CARDINALITY (3 modalities = 3 tasks at
  * any data size). The two-phase form must (a) produce identical
  * numbers, (b) never plan a per-key window over the full relation,
  * and (c) compute the range-partitioned base exactly once (the local
  * slices and the offsets table both hang off one exchange — if reuse
  * broke, two independently-sampled range partitionings could disagree
  * on slice boundaries).
  */
class PackingSpec extends SparkTestBase {

  private val packers =
    Seq("corpus_pack_contexts", "corpus_token_budget", "multimodal_shard_pack")

  private def windowsOf(p: SparkPlan): Seq[WindowExec] = {
    val self = p match { case w: WindowExec => Seq(w); case _ => Seq.empty }
    self ++ p.children.flatMap(windowsOf) ++ p.subqueries.flatMap(windowsOf)
  }

  test("two-phase cumsum equals the single-window form (id order and size-desc order)") {
    import spark.implicits._
    // adversarial shape: one dominant key, several tiny keys, duplicate
    // sizes, arbitrary incoming partitioning
    val df = (1L to 5000L).map { i =>
      (i, if (i % 10 == 0) s"src${i % 7}" else "big", (i * 2654435761L % 97) + 1)
    }.toDF("doc_id", "source", "n").repartition(16)

    val naiveId = df.withColumn("cum", sum(col("n")).over(
      Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val twoId = CorpusOps.keyedCumsum(df, "source", Seq(col("doc_id")), "n", "cum")
      .select("doc_id", "source", "n", "cum")
    assert(twoId.exceptAll(naiveId.select("doc_id", "source", "n", "cum")).count() == 0)
    assert(naiveId.select("doc_id", "source", "n", "cum").exceptAll(twoId).count() == 0)

    val descOrder = Seq(col("n").desc, col("doc_id"))
    val naiveDesc = df.withColumn("cum", sum(col("n")).over(
      Window.partitionBy(col("source")).orderBy(col("n").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val twoDesc = CorpusOps.keyedCumsum(df, "source", descOrder, "n", "cum")
      .select("doc_id", "source", "n", "cum")
    assert(twoDesc.exceptAll(naiveDesc.select("doc_id", "source", "n", "cum")).count() == 0)
    assert(naiveDesc.select("doc_id", "source", "n", "cum").exceptAll(twoDesc).count() == 0)
  }

  test("packers plan no per-key window over the full relation") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      packers.foreach { name =>
        val ws = windowsOf(SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan)
        assert(ws.nonEmpty, s"$name: expected window nodes")
        ws.foreach { w =>
          // every window either runs over one partition's slice of one
          // key (partitionSpec = [pid, key]) or over the aggregated
          // (≤ #partitions × keys-per-partition rows) offsets relation
          val overOffsets =
            w.child.collect { case a: BaseAggregateExec => a }.nonEmpty
          assert(w.partitionSpec.size >= 2 || overOffsets,
            s"$name: per-key window over the full relation:\n$w")
          assert(w.partitionSpec.nonEmpty,
            s"$name: unpartitioned window:\n$w")
        }
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("the range-partitioned base is computed once (runtime exchange reuse)") {
    packers.foreach { name =>
      val qe = SparkEntry.queries(name)(spark, sfDir).queryExecution
      qe.toRdd.count()
      val plan = qe.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"$name: plan not finalized")
      assert("ReusedQueryStage|ReusedExchange".r.findFirstIn(plan).isDefined,
        s"$name: offsets side re-executes the ranged base instead of reusing it:\n$plan")
    }
  }
}

package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup at the smallest SF: JIT + codegen for the shared
    // operator paths (scan/agg/join/window/exchange), so the first timed
    // query isn't charged for session spin-up
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // median-of-3 inside one JVM: round-1 showed single-shot timings
    // swinging 3-20× with machine contention (28.4s vs a 1.4s quiet
    // re-run for the same plan); the median makes round-over-round
    // comparisons mean something. Plan construction is timed along with
    // execution on every run (eager steps like localCheckpoint belong
    // to the query's cost).
    val runs = 3
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        // noop sink: materializes EVERY output column (count() would let
        // Catalyst prune the projections and under-measure the query)
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> times(runs / 2)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

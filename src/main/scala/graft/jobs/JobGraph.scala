package graft.jobs

import scala.collection.mutable

/** Batch job-graph execution semantics — the public-knowledge
  * re-expression of the reference's Dagster job/op layer
  * (etl_jobs/restaurant_menu_pdf_job.py:74-103 op wiring,
  * dagster retry policies on the extraction ops): named ops with
  * dependencies, bounded deterministic retries, and skip-downstream-
  * on-failure semantics.
  *
  * This is deliberately a DRIVER-side coordination surface: each op
  * body is typically one Spark action (write/collect-free plans built
  * elsewhere), so the graph adds orchestration without touching the
  * distributed plan — Spark's scheduler still owns all data
  * parallelism. Ops with no dependency ordering between them are
  * independent stages; at cluster scale they can be submitted through
  * separate scheduler pools, which changes nothing about these
  * semantics.
  */
object JobGraph {

  /** One node: `deps` must complete before `name` starts; a throwing
    * body is retried up to `maxRetries` extra attempts.
    */
  final case class Op(name: String, deps: Seq[String], maxRetries: Int, body: () => Unit)

  /** Terminal state of one op after a run. `attempts` counts executions
    * (0 for skipped ops); `error` carries the LAST failure message.
    */
  final case class OpRun(name: String, attempts: Int, status: String, error: Option[String])

  val Succeeded = "succeeded"
  val Failed = "failed"
  val Skipped = "skipped" // an upstream dependency failed

  /** Run the graph: topological order (stable — declaration order
    * breaks ties, so runs are deterministic), retries per op, and any
    * op downstream of a failure is skipped rather than run against
    * missing inputs. Returns one OpRun per op in execution order.
    * Cycles and unknown dependencies fail fast at validation.
    */
  def run(ops: Seq[Op]): Seq[OpRun] = {
    val byName = ops.map(o => o.name -> o).toMap
    require(byName.size == ops.size, "duplicate op names")
    ops.foreach(o => o.deps.foreach(d =>
      require(byName.contains(d), s"op ${o.name} depends on unknown op $d")))

    // Kahn's algorithm with declaration-order tie-break; indegrees are
    // over DISTINCT deps (the decrement below fires once per completed
    // op, so a duplicated dep entry must not count twice)
    val indeg = mutable.Map(ops.map(o => o.name -> o.deps.distinct.size): _*)
    val order = mutable.ArrayBuffer.empty[Op]
    val ready = mutable.ArrayBuffer(ops.filter(_.deps.isEmpty): _*)
    while (ready.nonEmpty) {
      val op = ready.remove(0)
      order += op
      ops.filter(_.deps.contains(op.name)).foreach { succ =>
        indeg(succ.name) -= 1
        if (indeg(succ.name) == 0) ready += succ
      }
    }
    require(order.size == ops.size, "job graph has a cycle")

    val state = mutable.Map.empty[String, OpRun]
    order.foreach { op =>
      if (op.deps.exists(d => state(d).status != Succeeded)) {
        state(op.name) = OpRun(op.name, 0, Skipped, None)
      } else {
        var attempts = 0
        var lastError: Option[String] = None
        var done = false
        while (!done && attempts <= op.maxRetries) {
          attempts += 1
          try { op.body(); done = true; lastError = None }
          catch { case e: Exception => lastError = Some(e.getMessage) }
        }
        state(op.name) =
          OpRun(op.name, attempts, if (done) Succeeded else Failed, lastError)
      }
    }
    order.map(o => state(o.name)).toSeq
  }
}

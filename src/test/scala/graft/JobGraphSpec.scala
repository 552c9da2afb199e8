package graft

import graft.jobs.JobGraph
import graft.jobs.JobGraph.{Op, OpRun}
import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.atomic.AtomicInteger

class JobGraphSpec extends AnyFunSuite {

  test("diamond graph runs in dependency order, each op once") {
    val log = scala.collection.mutable.ArrayBuffer.empty[String]
    val runs = JobGraph.run(Seq(
      Op("extract", Nil, 0, () => log += "extract"),
      Op("clean", Seq("extract"), 0, () => log += "clean"),
      Op("match", Seq("extract"), 0, () => log += "match"),
      Op("index", Seq("clean", "match"), 0, () => log += "index")))
    assert(runs.forall(_.status == JobGraph.Succeeded))
    assert(log.head == "extract" && log.last == "index")
    assert(log.size == 4 && log.toSet == Set("extract", "clean", "match", "index"))
  }

  test("retries re-run the body and succeed once it stops throwing") {
    val tries = new AtomicInteger(0)
    val runs = JobGraph.run(Seq(
      Op("flaky", Nil, 2, () =>
        if (tries.incrementAndGet() < 3) throw new RuntimeException("transient"))))
    assert(runs == Seq(OpRun("flaky", 3, JobGraph.Succeeded, None)))
    assert(tries.get() == 3)
  }

  test("a permanently failing op fails with the last error; downstream skipped, siblings run") {
    val ran = scala.collection.mutable.Set.empty[String]
    val runs = JobGraph.run(Seq(
      Op("src", Nil, 0, () => ran += "src"),
      Op("bad", Seq("src"), 1, () => throw new RuntimeException("boom")),
      Op("after_bad", Seq("bad"), 0, () => ran += "after_bad"),
      Op("sibling", Seq("src"), 0, () => ran += "sibling"))).map(r => r.name -> r).toMap
    assert(runs("bad").status == JobGraph.Failed)
    assert(runs("bad").attempts == 2)
    assert(runs("bad").error.contains("boom"))
    assert(runs("after_bad").status == JobGraph.Skipped)
    assert(runs("after_bad").attempts == 0)
    assert(runs("sibling").status == JobGraph.Succeeded)
    assert(ran == Set("src", "sibling"))
  }

  test("a duplicated dependency entry is not a cycle") {
    var ran = List.empty[String]
    val runs = JobGraph.run(Seq(
      Op("src", Nil, 0, () => ran ::= "src"),
      // deps lists src twice — must still reach indegree 0 and run
      Op("dup", Seq("src", "src"), 0, () => ran ::= "dup")))
      .map(r => r.name -> r).toMap
    assert(runs("dup").status == JobGraph.Succeeded)
    assert(ran.reverse == List("src", "dup"))
  }

  test("cycles and unknown deps fail fast") {
    intercept[IllegalArgumentException] {
      JobGraph.run(Seq(
        Op("a", Seq("b"), 0, () => ()),
        Op("b", Seq("a"), 0, () => ())))
    }
    intercept[IllegalArgumentException] {
      JobGraph.run(Seq(Op("a", Seq("ghost"), 0, () => ())))
    }
  }
}

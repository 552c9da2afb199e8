package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver that collects bench output retains only its last ~2000
  * characters and parses the JSON summary line from that tail. Rounds
  * 1-3 shipped a line with every per-query timing at full double
  * precision (~4KB) — truncated mid-line, never parsed, no bench
  * signal for three rounds. This spec pins the contract: the summary
  * line must stay far enough under the capture window to survive
  * trailing sbt chatter, for the CURRENT query set and worst-case
  * timing widths.
  */
class BenchLineSpec extends AnyFunSuite {

  // worst-case widths: every registered query present, 4-digit seconds
  private val worstCase: Map[String, Double] =
    SparkEntry.queries.keys.map(_ -> 9999.999).toMap

  test("summary line stays under the driver's 2000-char capture window") {
    val line = Bench.summaryLine(worstCase, "/root/testdata/sf0.1")
    // leave ≥300 chars of headroom for the '[info] ' prefix and the
    // '[success] Total time …' line that share the captured tail
    assert(line.length <= 1700, s"summary line ${line.length} chars:\n$line")
  }

  test("summary line is valid JSON-shaped (balanced braces, no raw doubles)") {
    val line = Bench.summaryLine(worstCase, "/tmp/x")
    assert(line.count(_ == '{') == line.count(_ == '}'))
    assert(line.startsWith("""{"metric":"total","value":"""))
    // 3-dp formatting everywhere — a raw double's 15+ digits would
    // blow the budget as the query set grows
    assert(!line.matches(""".*\d\.\d{4,}.*"""), "unformatted double on the line")
  }

  test("every headline query still exists in the registry") {
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"stale headline entries: $missing")
  }
}

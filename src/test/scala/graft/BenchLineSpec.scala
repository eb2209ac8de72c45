package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver records only the LAST 2000 bytes of bench output, and sbt's
  * success footer consumes ~75 of them. If the canonical JSON line ever
  * outgrows the remaining window, the driver can no longer parse the
  * round's bench numbers (this silently happened in round 2 and nearly
  * happened again at 195 queries) — so the budget is enforced here at the
  * registry's ACTUAL size with worst-case value widths. */
class BenchLineSpec extends AnyFunSuite {

  private val TailWindow = 2000
  private val SbtFooter = 90 // "[success] Total time: ..." + newlines

  test("canonical bench line fits the driver tail window, worst case") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    // worst-case jit block: both values at clamp width, widest query key
    val jitWorst = Some((123456.7, 123456.7, "9999"))
    // worst realistic width: every query at 9.9s (widest folded value)
    val line = Bench.canonicalLine(names.map(_ -> 9.9), "sf0.1", jitWorst)
    assert(line.length + 1 + SbtFooter <= TailWindow,
      s"canonical line ${line.length}B no longer fits the ${TailWindow}B " +
        "tail with the sbt footer — compress the scheme before adding " +
        "more queries (see Bench.scala budget comment)")
    // pathological contended run: per-entry values clamp at 4 chars, so
    // the line stays bounded for ANY value magnitude
    val worst = Bench.canonicalLine(names.map(_ -> 123456.7), "sf0.1",
      jitWorst)
    assert(worst.length + 1 + SbtFooter <= TailWindow,
      s"pathological line ${worst.length}B overflows the tail window")
    assert(worst.contains(":9999"), "5+ digit values must clamp to 9999")
    assert(worst.contains(""""jit":{"total":9999,"max":9999"""),
      "jit block must clamp like query values")
    // and it must be the driver-expected shape
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.contains(""""queries":{"""))
  }

  test("digitless query names get a bounded sentinel key, not a throw") {
    val line = Bench.canonicalLine(Seq("weird_name" -> 1.0), "sf0.1")
    assert(line.contains(""""x"""), s"sentinel key missing: $line")
  }

  test("rest bucket accounts for exactly the fastest queries") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.zipWithIndex.map { case (n, i) => n -> (i * 0.1) }
    val line = Bench.canonicalLine(results, "sf0.1")
    val omitted = math.max(0, names.size - Bench.MaxExactEntries)
    if (omitted > 0) {
      assert(line.contains(s""""rest":{"n":$omitted,"sec":"""),
        s"rest bucket must carry the $omitted fastest queries:\n$line")
      // the slowest query is always an exact entry
      val slowKey = results.maxBy(_._2)._1
        .takeWhile(_ != '_').dropWhile(!_.isDigit).toInt
      assert(line.contains(s""""$slowKey":"""), "slowest query omitted")
    }
  }
}

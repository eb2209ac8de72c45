package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lints Bench's untimed fixture-prebuild stage for COMPLETENESS against
  * the source tree: every `def *Fixture` defined anywhere in src/main
  * must have an entry in [[Bench.fixtureBuilders]]. Round 7 shipped with
  * three builders missing from the prebuild list (aviFixture,
  * streamAnnFixture, docsSplitFixture) and one blanket try around the
  * rest — so a fixture could be first-built INSIDE a timed query and
  * silently inflate its wall (the q260 adjudication cost). This spec
  * makes the invariant structural: add a fixture, forget the Bench
  * entry, the suite goes red.
  */
class BenchFixtureSpec extends AnyFunSuite {

  private def scalaFiles(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).getOrElse(Array.empty).toSeq.flatMap { f =>
      if (f.isDirectory) scalaFiles(f)
      else if (f.getName.endsWith(".scala")) Seq(f)
      else Nil
    }

  test("every def *Fixture in src/main has a Bench prebuild entry") {
    val defRe = """def\s+(\w*Fixture)\s*\(""".r
    val root = new java.io.File("src/main/scala/graft")
    assert(root.isDirectory, s"expected source tree at $root")
    val defined = scalaFiles(root).flatMap { f =>
      val src = scala.io.Source.fromFile(f, "UTF-8")
      val text = try src.mkString finally src.close()
      defRe.findAllMatchIn(text).map(_.group(1)).toSeq
    }.toSet
    val prebuilt = Bench.fixtureBuilders.map(_._1).toSet
    val missing = defined -- prebuilt
    assert(missing.isEmpty,
      s"fixture builders missing from Bench.fixtureBuilders: " +
        s"${missing.toSeq.sorted.mkString(", ")} — a fixture not " +
        "prebuilt lands its build cost inside the first timed query " +
        "that touches it")
    // and the list doesn't reference names that no longer exist
    // (warmup_* entries are stage warmers, not fixture defs)
    val stale = prebuilt.filterNot(_.startsWith("warmup_")) -- defined
    assert(stale.isEmpty,
      s"Bench.fixtureBuilders entries with no matching def: " +
        stale.toSeq.sorted.mkString(", "))
  }

  test("seeded violation: the lint regex actually finds fixture defs") {
    val defRe = """def\s+(\w*Fixture)\s*\(""".r
    val sample = "private[graft] def ghostFixture(s: SparkSession, " +
      "d: String): String = ???"
    assert(defRe.findFirstMatchIn(sample).map(_.group(1))
      .contains("ghostFixture"))
  }
}

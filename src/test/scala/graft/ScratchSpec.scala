package graft

import java.io.File
import org.scalatest.funsuite.AnyFunSuite

/** Scratch.runDir's age-based reap: the staleness clock must read the
  * NEWEST mtime anywhere under a run dir, not the dir's own mtime — a
  * streaming checkpoint writing into a stable subtree (offsets/, state/)
  * looks idle at the top while actively committing below, and reaping it
  * kills a live query in another JVM. */
class ScratchSpec extends AnyFunSuite {

  private def mkRun(parent: File, name: String, topAge: Long,
      leafAge: Long): File = {
    val d = new File(parent, name)
    val sub = new File(d, "state/0")
    sub.mkdirs()
    val leaf = new File(sub, "snapshot")
    java.nio.file.Files.writeString(leaf.toPath, "x")
    val now = System.currentTimeMillis()
    leaf.setLastModified(now - leafAge)
    sub.setLastModified(now - topAge)
    new File(d, "state").setLastModified(now - topAge)
    d.setLastModified(now - topAge)
    d
  }

  test("reap keys on the subtree's newest mtime, not the dir's own") {
    val tag = s"graft_scratchspec_${System.nanoTime()}"
    val parent = new File(Scratch.root, tag)
    parent.mkdirs()
    try {
      val threeH = 3L * 3600 * 1000
      // top looks 3h idle but a leaf committed 1 min ago: LIVE, keep
      val live = mkRun(parent, "live", threeH, 60 * 1000)
      // every level 3h old: genuinely stale, reap
      val stale = mkRun(parent, "stale", threeH, threeH)
      Scratch.runDir(tag)
      assert(live.exists(),
        "a run with recent leaf writes must survive the reap even when " +
          "its top-level mtime is stale")
      assert(!stale.exists(), "a fully idle run must be reaped")
    } finally {
      def rm(f: File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(parent)
    }
  }
}

package graft

/** Fast ephemeral scratch locations.
  *
  * This container's disk reads ~10 MB/s cold; ephemeral artifacts that sit
  * on a query's timed path (ingest fixtures, streaming checkpoints, shuffle
  * scratch) belong on tmpfs so benchmarks measure the engine, not the disk.
  * On a real cluster the resource manager provides the equivalent via
  * SPARK_LOCAL_DIRS-style fast local volumes.
  */
object Scratch {

  /** tmpfs when present, else the JVM temp dir. */
  lazy val root: String = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) shm.getAbsolutePath
    else sys.props("java.io.tmpdir")
  }

  /** Deterministic per-SF fixture dir; fixtures are written once per
    * (sf, kind) and re-used by later queries in the same JVM/container. */
  def fixtureDir(sfDir: String, kind: String): String =
    s"$root/graft_fixtures/${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}/$kind"
}

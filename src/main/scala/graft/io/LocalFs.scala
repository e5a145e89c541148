package graft.io

/** Local-filesystem helpers for the harness-side code paths (temp
  * checkpoint/state dirs, staged growth corpora). These never run on the
  * data path — executors write through Spark sinks; only driver-local
  * scratch directories are cleaned up here. */
object LocalFs {

  /** Recursive delete, tolerant of concurrent removal (a vanished child
    * lists as null and is skipped). Does NOT follow symlinks into their
    * targets: `listFiles` of a symlinked dir returns its entries, but the
    * scratch dirs this cleans are created by this process and contain
    * none. */
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(); ()
  }
}

package graft.io

/** Local-filesystem helpers for the harness-side code paths (temp
  * checkpoint/state dirs, staged growth corpora). These never run on the
  * data path — executors write through Spark sinks; only driver-local
  * scratch directories are cleaned up here. */
object LocalFs {

  /** Recursive delete, tolerant of concurrent removal (a vanished child
    * lists as null and is skipped). Does NOT follow symlinks: a symlinked
    * directory is unlinked, never recursed into (`File.isDirectory` would
    * resolve the link and `listFiles` would return the TARGET's entries —
    * a stray symlink inside a scratch dir must not delete its target's
    * contents). */
  def deleteRecursively(f: java.io.File): Unit = {
    val isRealDir = java.nio.file.Files.isDirectory(
      f.toPath, java.nio.file.LinkOption.NOFOLLOW_LINKS)
    if (isRealDir)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(); ()
  }
}

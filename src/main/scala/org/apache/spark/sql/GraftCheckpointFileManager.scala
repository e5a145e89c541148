package org.apache.spark.sql

import java.io.{BufferedOutputStream, File}
import java.net.URI
import java.nio.file.{Files, StandardCopyOption}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FSDataInputStream,
  FSDataOutputStream, Path, PathFilter, RawLocalFileSystem}
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager.CancellableFSDataOutputStream

/** Fork-free [[CheckpointFileManager]] for LOCAL-filesystem checkpoints,
  * plugged in via the documented `spark.sql.streaming.checkpointFileManagerClass`
  * conf (reflective `(Path, Configuration)` constructor, as the default
  * managers use).
  *
  * Why it exists (r17): the default manager routes every checkpoint
  * mkdir/create through Hadoop's `RawLocalFileSystem` permission path,
  * and with no native Hadoop library on the box `setPermission` shells
  * out — a measured **60 `chmod` process forks for ONE AvailableNow run**
  * of the hourly-counts stream (state dirs, per-store metadata, WAL tmp
  * files; counted with a PATH-shimmed chmod), plus the ChecksumFileSystem
  * `.crc` twin for every file. A harness or daily pipeline that starts
  * hundreds of short streams pays that per run; stack samples put
  * `Shell.runCommand` fork/wait among the top driver frames of the
  * streaming family.
  *
  * This manager keeps the default manager's ATOMIC-RENAME commit contract
  * (write `.tmp`, rename; `overwriteIfPossible=false` throws Hadoop's
  * `FileAlreadyExistsException` exactly like `FileSystemBasedCheckpointFileManager`)
  * but performs directory creation and file writes through `java.nio` —
  * no permission round-trips, no checksum twins — and delegates the
  * fork-free read-side operations (open/list/status) to a plain
  * `RawLocalFileSystem`. Local paths only by construction: any
  * non-`file:` checkpoint location is rejected loudly so a production
  * deployment on HDFS/object storage falls back to the default manager
  * by simply not setting the conf (HarnessSession parameterizes it;
  * explicit -D wins).
  */
class GraftCheckpointFileManager(path: Path, conf: Configuration)
    extends CheckpointFileManager {

  locally {
    val scheme = path.toUri.getScheme
    require(scheme == null || scheme == "file",
      s"GraftCheckpointFileManager handles local checkpoints only, got " +
        s"'$path' — unset spark.sql.streaming.checkpointFileManagerClass " +
        "for non-local checkpoint locations")
  }

  /** Read-side delegate: open/list/getFileStatus never fork (only the
    * permission-taking create/mkdirs overloads do). Raw (not Checksum)
    * so no `.crc` twins are written or expected. */
  private val rawFs = {
    val fs = new RawLocalFileSystem()
    fs.initialize(URI.create("file:///"), conf)
    fs
  }

  private def toFile(p: Path): File = {
    val u = p.toUri
    require(u.getScheme == null || u.getScheme == "file",
      s"non-local path in local checkpoint: $p")
    new File(u.getPath)
  }

  /** Write `.<name>.<uuid>.tmp` in the destination directory, rename on
    * close — the same temp naming and atomic-rename commit protocol as
    * Spark's RenameBasedFSDataOutputStream (whose RenameHelperMethods
    * hook trait is sealed, hence this standalone twin). */
  private class RenameOnCloseStream(finalPath: Path,
                                    overwriteIfPossible: Boolean,
                                    tmp: java.nio.file.Path)
      extends CancellableFSDataOutputStream(
        new BufferedOutputStream(Files.newOutputStream(tmp), 64 * 1024)) {
    @volatile private var terminated = false
    override def close(): Unit = synchronized {
      if (!terminated) {
        terminated = true
        super.close()
        val dst = toFile(finalPath).toPath
        if (!overwriteIfPossible && Files.exists(dst)) {
          Files.deleteIfExists(tmp)
          // same contract (and same exception class) as the default
          // manager: the metadata-log batch fence catches Hadoop's
          // FileAlreadyExistsException to detect a concurrent committer
          throw new FileAlreadyExistsException(
            s"rename destination $finalPath already exists")
        }
        // rename(2) on one filesystem: atomic; replaces dst, which
        // matches the overwriteIfPossible=true contract, and the
        // !overwrite case is fenced by the exists check above (the
        // default local manager has the same check-then-rename window)
        Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
      }
    }
    override def cancel(): Unit = synchronized {
      if (!terminated) {
        terminated = true
        try super.close() finally Files.deleteIfExists(tmp)
      }
    }
  }

  override def createAtomic(path: Path,
                            overwriteIfPossible: Boolean)
      : CancellableFSDataOutputStream = {
    val f = toFile(path)
    Files.createDirectories(f.getParentFile.toPath)
    val tmp = new File(f.getParentFile,
      s".${f.getName}.${java.util.UUID.randomUUID}.tmp").toPath
    new RenameOnCloseStream(path, overwriteIfPossible, tmp)
  }

  override def open(path: Path): FSDataInputStream = rawFs.open(path)

  override def list(path: Path, filter: PathFilter) =
    rawFs.listStatus(path, filter)

  override def mkdirs(path: Path): Unit =
    Files.createDirectories(toFile(path).toPath)

  override def exists(path: Path): Boolean = toFile(path).exists()

  override def delete(path: Path): Unit = {
    try rawFs.delete(path, true)
    catch { case _: java.io.FileNotFoundException => () }
  }

  override def isLocal: Boolean = true

  override def createCheckpointDirectory(): Path = {
    mkdirs(path)
    path.makeQualified(URI.create("file:///"), new Path("/"))
  }
}

package graft.io

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class LocalFsSpec extends AnyFunSuite {

  test("deleteRecursively removes nested trees") {
    val root = Files.createTempDirectory("graft_localfs").toFile
    val sub = new java.io.File(root, "a/b/c")
    assert(sub.mkdirs())
    Files.write(new java.io.File(sub, "f.txt").toPath, "x".getBytes)
    LocalFs.deleteRecursively(root)
    assert(!root.exists())
  }

  test("deleteRecursively unlinks a symlinked dir without entering it") {
    val target = Files.createTempDirectory("graft_localfs_target")
    val keep = target.resolve("keep.txt")
    Files.write(keep, "precious".getBytes)
    val root = Files.createTempDirectory("graft_localfs_scratch")
    Files.createSymbolicLink(root.resolve("link"), target)
    LocalFs.deleteRecursively(root.toFile)
    assert(!root.toFile.exists())
    // the link's TARGET must be untouched
    assert(Files.exists(keep), "symlink target contents were deleted")
    LocalFs.deleteRecursively(target.toFile)
  }
}

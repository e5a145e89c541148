package graft.io

import java.nio.file.Files

import graft.SparkSpec

class SourcesSpec extends SparkSpec {

  test("inputExists handles literal dirs, globs, and empty/missing paths") {
    val dir = Files.createTempDirectory("graft_src")
    val batches = dir.resolve("batches")
    Files.createDirectory(batches)

    // empty dir → no input
    assert(!Sources.inputExists(spark, batches.toString))
    // glob with no matches → no input
    assert(!Sources.inputExists(spark, s"$batches/*.csv"))
    // missing path → no input (not an exception)
    assert(!Sources.inputExists(spark, s"$dir/nope"))

    Files.writeString(batches.resolve("b1.csv"), "user_id\n1\n")
    // literal dir with a non-empty file
    assert(Sources.inputExists(spark, batches.toString))
    // glob matching the file (the orchestrator's usual form)
    assert(Sources.inputExists(spark, s"$batches/*.csv"))
    // glob matching nothing despite other files present
    assert(!Sources.inputExists(spark, s"$batches/*.parquet"))

    // zero-byte file does not count as input
    val empty = dir.resolve("empty")
    Files.createDirectory(empty)
    Files.writeString(empty.resolve("z.csv"), "")
    assert(!Sources.inputExists(spark, s"$empty/*.csv"))
  }
}

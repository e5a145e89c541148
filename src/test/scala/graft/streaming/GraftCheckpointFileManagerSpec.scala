package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, Path}
import org.apache.spark.sql.GraftCheckpointFileManager
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The fork-free local CheckpointFileManager (r17) must honor the exact
  * commit contract the streaming metadata logs and state stores rely on:
  * atomic rename-on-close, FileAlreadyExistsException fencing when
  * overwrite is disallowed, cancel leaving no partial file, and plain
  * list/open/delete round-trips. Plus one end-to-end AvailableNow stream
  * through the manager equaling the batch aggregate. */
class GraftCheckpointFileManagerSpec extends SparkSpec {

  private def newFm(root: String) =
    new GraftCheckpointFileManager(new Path(root), new Configuration())

  private def tmpRoot(): String =
    Files.createTempDirectory("graft_ckpt_fm_spec").toString

  test("createAtomic commits on close and the content round-trips") {
    val root = tmpRoot()
    val fm = newFm(root)
    val p = new Path(s"$root/offsets/0")
    val out = fm.createAtomic(p, overwriteIfPossible = false)
    out.write("v1\nbatch0".getBytes("UTF-8"))
    // not visible before close (rename-based commit)
    assert(!fm.exists(p))
    out.close()
    assert(fm.exists(p))
    val in = fm.open(p)
    val buf = new Array[Byte](64)
    val n = in.read(buf)
    in.close()
    assert(new String(buf, 0, n, "UTF-8") === "v1\nbatch0")
    // no temp or crc droppings next to the committed file
    val names = fm.list(new Path(s"$root/offsets")).map(_.getPath.getName)
    assert(names.toSeq === Seq("0"))
  }

  test("createAtomic(overwrite=false) fences an existing batch file") {
    val root = tmpRoot()
    val fm = newFm(root)
    val p = new Path(s"$root/commits/0")
    val first = fm.createAtomic(p, overwriteIfPossible = false)
    first.write("a".getBytes); first.close()
    val second = fm.createAtomic(p, overwriteIfPossible = false)
    second.write("b".getBytes)
    // the SAME exception class the default manager throws — the
    // HDFSMetadataLog batch fence catches exactly this
    intercept[FileAlreadyExistsException] { second.close() }
    // loser's temp file cleaned up, winner's content intact
    assert(fm.list(new Path(s"$root/commits")).map(_.getPath.getName)
      .toSeq === Seq("0"))
    val in = fm.open(p); assert(in.read().toChar === 'a'); in.close()
  }

  test("createAtomic(overwrite=true) replaces atomically") {
    val root = tmpRoot()
    val fm = newFm(root)
    val p = new Path(s"$root/state/1/1/1.delta")
    val a = fm.createAtomic(p, overwriteIfPossible = true)
    a.write("old".getBytes); a.close()
    val b = fm.createAtomic(p, overwriteIfPossible = true)
    b.write("new".getBytes); b.close()
    val in = fm.open(p)
    val buf = new Array[Byte](8); val n = in.read(buf); in.close()
    assert(new String(buf, 0, n) === "new")
  }

  test("cancel leaves neither the file nor a temp behind") {
    val root = tmpRoot()
    val fm = newFm(root)
    val p = new Path(s"$root/offsets/7")
    val out = fm.createAtomic(p, overwriteIfPossible = false)
    out.write("partial".getBytes)
    out.cancel()
    assert(!fm.exists(p))
    assert(fm.list(new Path(s"$root/offsets")).isEmpty)
  }

  test("mkdirs / exists / delete round-trip; delete of missing is a no-op") {
    val root = tmpRoot()
    val fm = newFm(root)
    val d = new Path(s"$root/state/0/3")
    fm.mkdirs(d)
    assert(fm.exists(d))
    fm.delete(d)
    assert(!fm.exists(d))
    fm.delete(d) // second delete must not throw
    assert(fm.createCheckpointDirectory().toUri.getPath ===
      Paths.get(root).toString)
  }

  test("non-local checkpoint locations are rejected loudly") {
    intercept[IllegalArgumentException] {
      new GraftCheckpointFileManager(
        new Path("hdfs://nn:9000/ckpt"), new Configuration())
    }
  }

  test("an AvailableNow stream through the manager equals the batch agg") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("graft_ckpt_fm_e2e")
    val src = dir.resolve("in").toString
    spark.range(0, 1000).select(col("id"),
        (col("id") % 7).as("k"))
      .write.mode("overwrite").parquet(src)
    val saved = spark.conf.getOption(
      "spark.sql.streaming.checkpointFileManagerClass")
    spark.conf.set("spark.sql.streaming.checkpointFileManagerClass",
      "org.apache.spark.sql.GraftCheckpointFileManager")
    try {
      val q = spark.readStream
        .schema(spark.read.parquet(src).schema).parquet(src)
        .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("id")).as("s"))
        .writeStream.format("memory").queryName("graft_ckpt_fm_probe")
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table("graft_ckpt_fm_probe")
        .orderBy("k").collect().map(_.toSeq).toSeq
      val want = spark.read.parquet(src)
        .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("id")).as("s"))
        .orderBy("k").collect().map(_.toSeq).toSeq
      assert(got === want)
    } finally {
      saved.fold(spark.conf.unset(
        "spark.sql.streaming.checkpointFileManagerClass"))(
        spark.conf.set("spark.sql.streaming.checkpointFileManagerClass", _))
      StreamHygiene.release(spark)
      graft.io.LocalFs.deleteRecursively(dir.toFile)
    }
  }
}

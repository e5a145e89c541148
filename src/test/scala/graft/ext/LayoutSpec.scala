package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout: bit-math parity with a straightforward reference
  * interleave, and the actual data-skipping property — a z-clustered
  * layout keeps BOTH dimensions' per-file ranges narrow, where a
  * single-column sort leaves the other dimension unclustered. */
class LayoutSpec extends SparkSpec {

  /** Reference Morton interleave: plain bit loop. */
  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zvalue2 matches the bit-loop reference on a value sweep") {
    val pairs = for {
      x <- Seq(0L, 1L, 2L, 3L, 255L, 256L, 12345L, 65535L)
      y <- Seq(0L, 1L, 7L, 100L, 32768L, 65535L)
    } yield (x, y)
    val df = spark.createDataFrame(pairs).toDF("x", "y")
      .withColumn("z", Layout.zvalue2(col("x"), col("y")))
    df.collect().foreach { r =>
      assert(r.getLong(2) === mortonRef(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  /** Reference 3-D Morton interleave. */
  private def morton3Ref(x: Long, y: Long, z: Long): Long = {
    var r = 0L
    var i = 0
    while (i < 16) {
      r |= ((x >> i) & 1L) << (3 * i)
      r |= ((y >> i) & 1L) << (3 * i + 1)
      r |= ((z >> i) & 1L) << (3 * i + 2)
      i += 1
    }
    r
  }

  test("zvalue3 matches the bit-loop reference on a value sweep") {
    val triples = for {
      x <- Seq(0L, 1L, 255L, 4095L, 65535L)
      y <- Seq(0L, 2L, 1000L, 65535L)
      z <- Seq(0L, 7L, 32768L, 65535L)
    } yield (x, y, z)
    val df = spark.createDataFrame(triples).toDF("x", "y", "z")
      .withColumn("m", Layout.zvalue3(col("x"), col("y"), col("z")))
    df.collect().foreach { r =>
      assert(r.getLong(3) ===
        morton3Ref(r.getLong(0), r.getLong(1), r.getLong(2)),
        s"(${r.getLong(0)}, ${r.getLong(1)}, ${r.getLong(2)})")
    }
  }

  test("z-clustering keeps both dimensions prunable; single sort does not") {
    val li = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "lineitem")
      .select(col("l_partkey").as("x"), col("l_suppkey").as("y"))
    val files = 16

    // suppkey spans 4 bits vs partkey's 8 — normalize both onto the
    // 16-bit budget so the interleave balances them
    def perFileRanges(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .collect()

    val xHi = 199L
    val yHi = 9L
    val z = perFileRanges(Layout.clusterByZ2(li,
      Layout.normalize16(col("x"), 0, xHi),
      Layout.normalize16(col("y"), 0, yHi), files))
    val xSorted = perFileRanges(
      li.repartitionByRange(files, col("x")).sortWithinPartitions(col("x")))

    // a point predicate on y: how many files must be read?
    def hits(rs: Array[org.apache.spark.sql.Row], yPoint: Long) =
      rs.count(r => r.getLong(3) <= yPoint && yPoint <= r.getLong(4))
    // and on x:
    def hitsX(rs: Array[org.apache.spark.sql.Row], xPoint: Long) =
      rs.count(r => r.getLong(1) <= xPoint && xPoint <= r.getLong(2))

    val zYHits = hits(z, 3)
    val sortYHits = hits(xSorted, 3)
    // x-sorted layout: every file spans all suppkeys — no y-pruning
    assert(sortYHits >= files - 1, s"sortYHits=$sortYHits")
    // z layout: a y-point prunes at least half the files
    assert(zYHits <= files / 2, s"zYHits=$zYHits")
    // and x-predicates still prune under z (coarser than pure x-sort,
    // but bounded)
    assert(hitsX(z, 57) <= files / 2, s"zXHits=${hitsX(z, 57)}")
  }

  test("normalize16 clamps out-of-range values to the range edges") {
    import spark.implicits._
    // unclamped, hi+1 would scale past 16 bits and WRAP through the
    // interleave masks — the largest value z-sorting as the smallest
    val rows = Seq(-5L, 0L, 50L, 100L, 101L, 1000000L).toDF("c")
      .select(Layout.normalize16(col("c"), 0L, 100L).as("n"))
      .as[Long].collect().toSeq
    assert(rows == Seq(0L, 0L, 32767L, 65535L, 65535L, 65535L))
    // monotone: out-of-range rows cluster at the edge, never invert
    assert(rows == rows.sorted)
  }

  test("hilbert walk: a bijection whose consecutive cells are adjacent") {
    import spark.implicits._
    // full 16x16 grid at bits=4: d must visit every cell exactly once
    // (bijection) and each step must move to a Manhattan-adjacent cell —
    // the continuity property Morton order lacks (Z-jumps)
    val grid = (for (x <- 0 until 16; y <- 0 until 16)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val walk = grid
      .select(col("x"), col("y"),
        Layout.hvalue2(col("x"), col("y"), bits = 4).as("d"))
      .orderBy("d")
      .as[(Long, Long, Long)].collect()
    assert(walk.map(_._3).toSeq == (0L until 256L))   // bijection
    walk.sliding(2).foreach { case Array((x1, y1, _), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-adjacent step ($x1,$y1)->($x2,$y2)")
    }
    // Morton, by contrast, jumps: count non-adjacent steps in z-order
    val zWalk = grid.select(col("x"), col("y"),
        Layout.zvalue2(col("x"), col("y")).as("z"))
      .orderBy("z").as[(Long, Long, Long)].collect()
    val zJumps = zWalk.sliding(2).count {
      case Array((x1, y1, _), (x2, y2, _)) =>
        math.abs(x1 - x2) + math.abs(y1 - y2) != 1
    }
    assert(zJumps > 0)
  }
}

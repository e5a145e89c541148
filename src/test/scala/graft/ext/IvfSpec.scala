package graft.ext

import graft.SparkSpec
import graft.io.Sources

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Sources.table(spark, "/root/testdata/sf0.001",
    "embeddings")
  private lazy val queries = emb.filter($"vec_id" < 10)

  test("IVF build is deterministic for a fixed seed") {
    val a = Ivf.build(emb).assignments.select("vec_id", "cell")
      .as[(Long, Int)].collect().toMap
    val b = Ivf.build(emb).assignments.select("vec_id", "cell")
      .as[(Long, Int)].collect().toMap
    assert(a == b)
    assert(a.size == emb.count())
  }

  test("IVF search recall vs brute force, and it scans fewer vectors") {
    val index = Ivf.build(emb, cells = 8)
    val exact = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = Ivf.search(index, queries, k = 5, nprobe = 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // every query must return results, from probed cells only
    assert(approx.keySet == exact.keySet)
    val recall = exact.map { case (q, ids) =>
      approx.getOrElse(q, Set.empty).intersect(ids).size.toDouble / ids.size
    }.sum / exact.size
    // 3 of 8 cells probed on unclusterable gaussian data still finds a
    // meaningful share of true neighbors; exact bound is data-dependent,
    // the invariant is "well above random" (random ≈ nprobe-independent
    // 5/500 per pick)
    assert(recall >= 0.3, s"recall@5 too low: $recall")
  }

  test("recall@5 is monotonically non-decreasing in nprobe (curve in SCALE.md)") {
    val index = Ivf.build(emb, cells = 8)
    val exact = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val curve = Seq(1, 2, 4, 8).map { nprobe =>
      val approx = Ivf.search(index, queries, k = 5, nprobe = nprobe)
        .select("query_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val recall = exact.map { case (q, ids) =>
        approx.getOrElse(q, Set.empty).intersect(ids).size.toDouble / ids.size
      }.sum / exact.size
      nprobe -> recall
    }
    info("recall@5 by nprobe (8 cells, sf0.001 embeddings): " +
      curve.map { case (np, r) => f"nprobe=$np%d -> $r%.2f" }.mkString(", "))
    curve.sliding(2).foreach { case Seq((npA, a), (npB, b)) =>
      assert(b >= a, f"recall fell from $a%.3f (nprobe=$npA) " +
        f"to $b%.3f (nprobe=$npB)")
    }
    // probing every cell IS brute force: recall must be exactly 1
    assert(curve.last._2 == 1.0, s"nprobe=cells recall ${curve.last._2} != 1")
  }

  test("searchPruned over a cell-partitioned layout equals search and " +
      "prunes partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_part").toFile
    try {
      val built = Ivf.build(emb, cells = 8)
      graft.io.Sinks.parquet(built.assignments, dir.getAbsolutePath,
        partitionBy = Seq("cell"))
      built.release()
      val celled = Ivf.Index(built.centroids,
        spark.read.parquet(dir.getAbsolutePath))
      // two queries at nprobe=1 probe at most 2 of the 8 cells — the scan
      // must read a strict subset of partitions
      val q2 = queries.filter($"vec_id" < 2)
      val pruned = Ivf.searchPruned(celled, q2, k = 5, nprobe = 1)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
        (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSet
      val got = rows(pruned) // executes THIS plan: metrics below are live
      assert(got == rows(Ivf.search(built, q2, k = 5, nprobe = 1)),
        "pruned result diverged from the full-assignments search")
      assert(got.nonEmpty)
      val exec = pruned.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val scans = collectScans(exec)
        .filter(_.relation.partitionSchema.nonEmpty)
        .filter(_.toString.contains("PartitionFilters: [cell"))
      assert(scans.nonEmpty, s"no static cell partition filter in:\n$exec")
      val read = scans.flatMap(_.metrics.get("numPartitions").map(_.value))
      assert(read.nonEmpty && read.forall(n => n >= 1L && n <= 2L),
        s"expected <= 2 of the 8 cell partitions read, got $read")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  /** Collect file scans through AQE query stages (QueryStageExec hides
    * its materialized plan behind `.plan`). */
  private def collectScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
    val here = p.collectWithSubqueries {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    val nested = p.collectWithSubqueries {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q
    }.flatMap(q => collectScans(q.plan))
    here ++ nested
  }
}

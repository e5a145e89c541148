package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the two claims [[Similarity.sq8IvfTopKPruned]] makes:
  *
  *  1. LOSSLESS — identical results to [[Similarity.sq8IvfTopK]] on the
  *     full corpus (the candidate join is an equi-join on the cell, so
  *     non-query cells contribute nothing);
  *  2. PRUNED — on a cell-partitioned parquet layout the query-cell
  *     restriction reaches the scan as a static PartitionFilter and the
  *     scan reads ONLY the query cells' partitions (numPartitions
  *     metric), the flat-growth property SCALE.md's round-9 SQ8-IVF rows
  *     measured (DynamicPruningSpec is the static sibling's template).
  */
class Sq8IvfPrunedSpec extends SparkSpec {
  import spark.implicits._

  // 40 vectors over 4 cells; deterministic non-trivial directions
  private def corpusRows: Seq[(Long, Int, Array[Float])] =
    (0L until 40L).map { i =>
      val v = Array.tabulate(8)(d =>
        (math.sin(i * 31 + d * 7) * 10).toFloat + (if (d == (i % 8)) 5f else 0f))
      (i, (i % 4).toInt, v)
    }

  test("pruned search equals the full-corpus search and prunes partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sq8ivf").toFile
    try {
      val corpus = corpusRows.toDF("vec_id", "label", "embedding")
      graft.io.Sinks.parquet(corpus, dir.getAbsolutePath,
        partitionBy = Seq("label"))
      val part = spark.read.parquet(dir.getAbsolutePath)
      // query batch confined to cells {1, 3} — half the partitions
      val queries = part.filter($"vec_id" === 1L || $"vec_id" === 7L)

      val pruned = Similarity.sq8IvfTopKPruned(queries, part, k = 3)
      val full = Similarity.sq8IvfTopK(queries, corpus, k = 3)
      // collect THIS dataframe (not a derived plan) so the scan metrics
      // inspected below belong to an executed query
      def norm(rs: Array[org.apache.spark.sql.Row]) = rs.map(r =>
        (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("vec_id"), r.getAs[Long]("dot_q"))).toSet
      val got = norm(pruned.collect())
      def rows(df: org.apache.spark.sql.DataFrame) = norm(df.collect())
      assert(got == rows(full), "pruned result diverged from full scan")
      assert(got.nonEmpty && got.map(_._1) == Set(1L, 7L))

      // the partitioned corpus scan must carry a partition filter and
      // read exactly the two query cells' partitions
      val exec = pruned.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val scans = collectScans(exec).filter(_.relation.partitionSchema.nonEmpty)
      // two partitioned scans appear (query side + corpus side, both read
      // from `part`); EVERY one is cell-restricted or vec_id-filtered, and
      // at least one carries the label IN filter reading 2 partitions
      assert(scans.nonEmpty, s"no partitioned scan in:\n$exec")
      val labelPruned = scans.filter(
        _.toString.contains("PartitionFilters: [label"))
      assert(labelPruned.nonEmpty,
        s"no static label partition filter in:\n${scans.map(_.toString)}")
      val read = labelPruned.flatMap(_.metrics.get("numPartitions")
        .map(_.value))
      assert(read.nonEmpty && read.forall(_ == 2L),
        s"expected 2 of 4 partitions read, got $read")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  test("an empty query batch yields an empty result, not a planning error") {
    // the collected cell set is empty -> isInCollection(Nil) must plan
    // (OptimizeIn folds it to false), not throw
    val corpus = corpusRows.toDF("vec_id", "label", "embedding")
    val none = corpus.filter($"vec_id" < 0)
    assert(Similarity.sq8IvfTopKPruned(none, corpus, k = 3).count() == 0L)
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

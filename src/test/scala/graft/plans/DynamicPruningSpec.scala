package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dynamic partition pruning (DPP): when a partitioned fact joins a dim
  * whose partition-key values are only known after a runtime filter, Spark
  * injects a dynamicpruning subquery into the fact scan's PartitionFilters
  * — the fact reads ONLY the partitions the filtered dim can reach. This
  * is the static-pruning sibling SinksSpec pins, lifted to predicates the
  * compiler cannot see: at 100 TB, "scan 2 of 300 date partitions because
  * the dim filter said so" is routinely a 100× scan cut, and it needs NO
  * query rewrite — only a partitioned layout and a join on the partition
  * column. Complements the runtime bloom filter (row-level, non-partition
  * keys) in etl/RuntimeFilterSpec. */
class DynamicPruningSpec extends SparkSpec {
  import spark.implicits._

  test("fact scan carries a dynamicpruning partition filter from the dim") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toFile
    try {
      val fact = spark.range(0, 20000).select(
        ($"id" % 20).cast("string").as("d"),
        ($"id" % 97).as("k"), $"id".as("v"))
      graft.io.Sinks.parquet(fact, dir.getAbsolutePath, partitionBy = Seq("d"))
      // Three conditions the rule checks, all easy to miss:
      //  - the dim must be FILE-BASED: a local relation's filter constant-
      //    folds into the relation before PartitionPruning runs, so no
      //    "selective predicate" is left to find;
      //  - the dim filter must be likely-selective (an equality, not a
      //    bare boolean column);
      //  - the join keys must be cast-free (partition-column inference
      //    reads "3" back as INT, so the dim key is int too).
      val dimDir = java.nio.file.Files.createTempDirectory("graft_dpp_dim")
        .toFile
      (0 until 20).map(i => (i, i % 10)).toDF("dim_d", "grp")
        .write.mode("overwrite").parquet(dimDir.getAbsolutePath)
      val dim = spark.read.parquet(dimDir.getAbsolutePath)
      val joined = spark.read.parquet(dir.getAbsolutePath)
        .join(dim.filter($"grp" === 3), $"d" === $"dim_d")
        .groupBy($"d").agg(sum($"v").as("sv"))
      try {
        // partition-column type inference reads "3" back as an int —
        // compare the values, not the storage type
        assert(joined.collect().map(_.get(0).toString).toSet ==
          Set("3", "13"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("dynamicpruning"),
          s"no dynamic partition pruning subquery in the fact scan:\n$plan")
        // and the scan actually read only the two surviving partitions
        val exec = joined.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        val scans = collectScans(exec)
        val factScan = scans.find(_.relation.partitionSchema.nonEmpty)
        assert(factScan.isDefined, s"no partitioned scan found in:\n$exec")
        val read = factScan.get.metrics.get("numPartitions").map(_.value)
        assert(read.contains(2L), s"expected 2 partitions read, got $read")
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(dimDir)
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  /** Collect file scans through AQE query stages, which hide their
    * materialized plans behind `QueryStageExec.plan`. */
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

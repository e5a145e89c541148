package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and sampling — the train/val/test
  * assignment a training pipeline needs to be STABLE: a row's split must
  * not change across reruns, engines, partitionings, or cluster sizes, and
  * adding rows must not reshuffle existing assignments. `rand()`-based
  * sampling violates all of that; hashing the row's key violates none.
  *
  * Bucket = first 8 hex chars of md5(key) mod 100 — cheap, uniform, and
  * reproducible in any engine (the DuckDB oracle computes the identical
  * value). Pure narrow projections: no shuffle, no UDF, codegen end to end.
  */
object Splits {

  /** Stable bucket in [0, 100) from the row key. */
  def hashBucket(key: Column): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long"), lit(100L))

  /** Assign train/val/test by hash bucket: [0,trainPct) → train,
    * [trainPct, trainPct+valPct) → val, rest → test.
    *
    * Null keys are EXCLUDED (same as [[sample]]): a null id has no stable
    * identity to split on, and letting the null bucket fall through the
    * when-chain would silently dump every such row into the eval split. */
  def assign(df: DataFrame, keyCol: String, trainPct: Int = 80,
             valPct: Int = 10): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val b = hashBucket(col(keyCol))
    df.filter(col(keyCol).isNotNull)
      .withColumn("bucket", b)
      .withColumn("split",
        when(b < trainPct, lit("train"))
          .when(b < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))
  }

  /** Stable `pct`% sample: rows whose bucket falls below pct. The same
    * rows are selected on every run and every engine; null keys are
    * excluded (consistent with [[assign]]). */
  def sample(df: DataFrame, keyCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"invalid sample pct: $pct")
    df.filter(col(keyCol).isNotNull && hashBucket(col(keyCol)) < pct)
  }

  /** Stratified deterministic sampling: each stratum keeps its own
    * percentage — the downsample-the-commons move every training-data mix
    * makes (keep all rare purchases, thin the view firehose). Same
    * hash-bucket mechanism as [[sample]], so the kept set is stable under
    * reruns, engines, and data growth; one narrow codegen'd filter, no
    * shuffle, no rand(). Strata absent from `pcts` keep `defaultPct`;
    * null stratum values keep defaultPct too (bucketing is on the KEY,
    * which is non-null by the filter). */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       pcts: Map[String, Int],
                       defaultPct: Int = 100): DataFrame = {
    (defaultPct +: pcts.values.toSeq).foreach(p =>
      require(p >= 0 && p <= 100, s"invalid sample pct: $p"))
    val pctExpr = pcts.foldLeft(lit(defaultPct)) { case (acc, (stratum, p)) =>
      when(col(stratumCol) === stratum, lit(p)).otherwise(acc)
    }
    df.filter(col(keyCol).isNotNull && hashBucket(col(keyCol)) < pctExpr)
  }
}

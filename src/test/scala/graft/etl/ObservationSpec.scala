package graft.etl

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Sources

/** Production observability: Dataset.observe() collects named metrics
  * DURING a job (accumulator-backed, merged across tasks) — row counts
  * and quality tallies come for free with the action instead of costing
  * a second scan. At 100 TB a separate metrics pass doubles the read
  * bill; observe() makes the metrics a side effect of the write. */
class ObservationSpec extends SparkSpec {

  test("observe() metrics match a direct aggregation, with no second scan") {
    val dir = "/root/testdata/sf0.001"
    val obs = Observation("ingest_metrics")
    val e = Sources.table(spark, dir, "events")
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null_value"),
        max(col("ts")).as("max_ts"))
      .filter(col("event_type").isNotNull)
    // one real action drives both the pipeline and the metrics
    val kept = e.write.format("noop").mode("overwrite").save()

    val m = obs.get
    val direct = Sources.table(spark, dir, "events").agg(
      count(lit(1)), sum(when(col("value").isNull, 1L).otherwise(0L)),
      max(col("ts"))).collect()(0)
    assert(m("n_rows") === direct.getLong(0))
    assert(m("n_null_value") === direct.getLong(1))
    assert(m("max_ts") === direct.getTimestamp(2))
  }
}

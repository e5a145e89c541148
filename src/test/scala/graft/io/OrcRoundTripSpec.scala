package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ORC format round trip: Spark's second columnar format works through
  * the same source machinery — schema, predicate pushdown, and data all
  * survive parquet → ORC → read. (S2/S4 surface: a reference user whose
  * lake mixes formats can switch `format()` without any operator
  * changes.) */
class OrcRoundTripSpec extends SparkSpec {

  test("events survive an ORC round trip with pushdown intact") {
    val src = Sources.table(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "event_type", "value")
    val dir = Files.createTempDirectory("graft_orc").toString + "/events"
    src.write.format("orc").save(dir)

    val back = spark.read.format("orc").load(dir)
    assert(back.schema === src.schema)
    assert(back.count() === src.count())
    // column-level parity via an order-independent checksum
    def sig(df: org.apache.spark.sql.DataFrame) = df.agg(
      sum("event_id"), sum("user_id"),
      sum(conv(md5(col("event_type").cast("binary")).substr(1, 8), 16, 10)
        .cast("long")),
      sum(col("value").cast("decimal(18,2)"))).collect()(0)
    assert(sig(back) === sig(src))

    // predicates reach the ORC scan (PushedFilters in the scan node)
    val plan = back.filter(col("user_id") === 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(user_id,7)"), plan.take(600))
  }
}

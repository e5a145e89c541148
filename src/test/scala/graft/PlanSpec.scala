package graft

import graft.queries.CoreQueries
import org.apache.spark.sql.DataFrame

/** Plan-shape regression tests: the physical properties that make the
  * engine scale are asserted here, so a refactor that silently loses a
  * broadcast, a pushed filter, or a fused exchange fails CI rather than a
  * 100 TB run. (Row-level correctness is the DuckDB gate's job; this pins
  * HOW the answer is computed.) */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("enrich join broadcasts the dimension and pushes its filter") {
    val p = plan(CoreQueries.enrichedEvents(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(500))
    assert(p.contains("GreaterThan(c_acctbal,5000.0)"),
      "dim filter must reach the parquet scan")
  }

  test("genre KPIs: window and aggregate share one hash exchange") {
    val p = plan(CoreQueries.genreKpis(spark, dir))
    val hashExchanges = "Exchange hashpartitioning".r
      .findAllIn(p).length
    assert(hashExchanges == 1,
      s"expected exactly 1 hash exchange (window+agg fused), got $hashExchanges:\n$p")
  }

  test("events scan prunes to the used columns") {
    val p = plan(CoreQueries.enrichedEvents(spark, dir)
      .select("event_id", "c_mktsegment"))
    // props (the widest column) must not be read
    assert(!p.contains("props"), "unused column read from parquet")
  }

  test("top-1 windows use WindowGroupLimit pushdown") {
    val p = plan(SparkEntry.queries("w2_top_artist")(spark, dir))
    assert(p.contains("WindowGroupLimit"), p.take(500))
  }

  test("null-key drop turns the left join into an inner join") {
    val p = plan(SparkEntry.queries("genre_kpis")(spark, dir))
    assert(!p.contains("LeftOuter"),
      "IsNotNull on join output should convert left->inner")
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.Rollups

/** The seven Documentation.pdf validation queries (SURVEY §3.3) as named
  * queries: Spark runs them through `spark.sql` over temp views of the KPI
  * outputs (the reference's analyst entry point); the oracle prepends the
  * KPI-producing CTE chain so DuckDB evaluates the identical SELECT text. */
object RollupQueries extends QueryGroup {

  private def run(name: String)(s: SparkSession, dir: String): DataFrame =
    Rollups.run(s, name,
      CoreQueries.genreKpis(s, dir), CoreQueries.hourlyKpis(s, dir))

  override val defs: Seq[QueryDef] = Rollups.sql.toSeq.sortBy(_._1).map {
    case (name, text) =>
      val ctes =
        if (name.startsWith("rollup_1")) CoreQueries.genreKpisCtes
        else CoreQueries.hourlyKpisCtes
      QueryDef(name, run(name), Some(ctes + text))
  }
}

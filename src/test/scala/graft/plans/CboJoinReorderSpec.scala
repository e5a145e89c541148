package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}

/** Cost-based join reordering: with table/column statistics (ANALYZE
  * TABLE) and CBO on, Catalyst rewrites the join ORDER the query author
  * wrote into the order the cost model prefers — joining the two small
  * tables first so the big fact meets an already-tiny intermediate,
  * instead of the written fact⋈mid first. At 100 TB this is the
  * difference between an intermediate of |fact| rows and one of |dim|
  * rows, and it requires NO query rewrite — only ANALYZE after load
  * (the production habit this spec exists to pin). Broadcast is forced
  * off so join ORDER, not strategy, is what's measured. */
class CboJoinReorderSpec extends SparkSpec {

  test("ANALYZE + CBO reorders a written-badly 3-table join") {
    val conf = spark.conf
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    val dir = "/root/testdata/sf0.001"
    def recreate(name: String, sql: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      spark.sql(s"CREATE TABLE $name USING parquet AS $sql")
      spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      recreate("cbo_fact",
        s"SELECT l_orderkey, l_suppkey, l_quantity FROM parquet.`$dir/lineitem.parquet`")
      recreate("cbo_mid",
        s"SELECT o_orderkey, o_custkey FROM parquet.`$dir/orders.parquet`")
      recreate("cbo_small",
        s"SELECT c_custkey, c_mktsegment FROM parquet.`$dir/customer.parquet` " +
          "WHERE c_custkey < 20")
      // written order: fact ⋈ mid first, small last — the worst order
      val q = """SELECT c_mktsegment, SUM(l_quantity) AS qty
                |FROM cbo_fact
                |JOIN cbo_mid ON l_orderkey = o_orderkey
                |JOIN cbo_small ON o_custkey = c_custkey
                |GROUP BY c_mktsegment""".stripMargin

      def innermostJoinTables(): Set[String] = {
        val plan = spark.sql(q).queryExecution.optimizedPlan
        val joins = plan.collect { case j: Join => j }
        val innermost = joins.last // deepest join in collect order
        def tables(p: LogicalPlan): Set[String] = p.collect {
          case r: org.apache.spark.sql.catalyst.catalog.HiveTableRelation =>
            r.tableMeta.identifier.table
          case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            l.catalogTable.map(_.identifier.table).getOrElse("")
        }.toSet
        tables(innermost)
      }

      conf.set("spark.sql.cbo.enabled", "false")
      conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      val without = innermostJoinTables()
      assert(without == Set("cbo_fact", "cbo_mid"),
        s"without CBO the written order should survive: $without")

      conf.set("spark.sql.cbo.enabled", "true")
      conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val withCbo = innermostJoinTables()
      assert(withCbo == Set("cbo_mid", "cbo_small"),
        s"CBO should join the two small tables first: $withCbo")

      // and the reorder is semantics-preserving
      val a = spark.sql(q).collect().map(r => (r.getString(0), r.getDouble(1)))
        .toMap
      conf.set("spark.sql.cbo.enabled", "false")
      val b = spark.sql(q).collect().map(r => (r.getString(0), r.getDouble(1)))
        .toMap
      assert(a == b)
    } finally {
      saved.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
      Seq("cbo_fact", "cbo_mid", "cbo_small")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}

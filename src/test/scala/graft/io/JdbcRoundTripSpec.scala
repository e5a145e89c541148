package graft.io

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** S3/S7/S9 verification (SURVEY §2.1) against embedded Apache Derby, which
  * ships on Spark's classpath — no network, same JVM, real JDBC protocol.
  *
  * Covers the reference's three JDBC behaviors end-to-end:
  *  - S7: CREATE TABLE with explicit column DDL (reference: users_to_rds.py:33-47
  *    builds `CREATE TABLE users (user_id INT, ...)`) via createTableColumnTypes,
  *    asserted by reading Derby's own catalog metadata back.
  *  - S9: batched inserts (reference: users_to_rds.py:48-60 `executemany` in
  *    chunks) via batchsize, asserted by a batch size smaller than the row
  *    count still landing every row exactly once.
  *  - S3: full-table scan read-back (reference:
  *    dags/music_streaming_services_dag.py:45-81 `SELECT * FROM users/songs`),
  *    including a partitioned parallel read — the scale path a single psycopg2
  *    cursor does not have.
  *
  * Each test seeds its OWN table, so tests run independently in any order
  * (single-test -z runs, reordering, parallel suites all work).
  */
class JdbcRoundTripSpec extends SparkSpec {
  import spark.implicits._

  // In-memory Derby: unique DB per suite run, created on first connect.
  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  private def usersDf = Seq(
    (1, "Alice", "alice@example.com", 34.5),
    (2, "Bob", null, 12.0),
    (3, "Carol", "carol@example.com", 99.25),
    (4, "Dave", "dave@example.com", 0.0),
    (5, "Eve", null, 7.75)
  ).toDF("user_id", "user_name", "user_email", "total_hours")

  // user_email (the nullable column) is deliberately NOT in the DDL
  // override: Spark's Derby dialect binds string NULLs as CLOB, and Derby
  // refuses a CLOB bind into a VARCHAR column — a real dialect interaction
  // this spec documents. Overridden columns carry non-null data.
  // batchSize = 2 is smaller than the row count: forces multiple batches.
  private def seed(table: String): Unit =
    Sinks.jdbc(usersDf, url, table, SaveMode.Overwrite,
      batchSize = 2,
      createTableColumnTypes =
        Some("user_id INT, user_name VARCHAR(120), total_hours DOUBLE"),
      options = opts)

  test("S7+S9+S3: DDL-typed overwrite write, batched, reads back equal") {
    seed("users_rt")
    val users = usersDf
    val back = Sources.jdbc(spark, url, "users_rt", opts)
    assert(back.schema.fieldNames.toSet === users.schema.fieldNames.toSet)
    val a = users.orderBy("user_id").collect().map(_.toSeq)
    val b = back.select(users.columns.map(col).toIndexedSeq: _*)
      .orderBy("user_id").collect().map(_.toSeq)
    assert(b.toSeq === a.toSeq)
  }

  test("S7: createTableColumnTypes reaches the database DDL") {
    seed("users_ddl")
    // Ask Derby's catalog (via raw JDBC metadata) what it actually created —
    // proves the option changed the DDL, not just that Spark accepted it.
    // Spark leaves the table name unquoted (Derby folds it to USERS_DDL) but
    // quotes column identifiers (case preserved) — both observed from Derby's
    // own catalog, which is the point: the DDL really reached the database.
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val md = conn.getMetaData.getColumns(null, null, "USERS_DDL", "user_name")
      assert(md.next(), "USERS_DDL.user_name not found in Derby catalog")
      assert(md.getString("TYPE_NAME") === "VARCHAR")
      assert(md.getInt("COLUMN_SIZE") === 120)
      // the column NOT in createTableColumnTypes got the dialect default (CLOB)
      val md2 = conn.getMetaData.getColumns(null, null, "USERS_DDL", "user_email")
      assert(md2.next() && md2.getString("TYPE_NAME") === "CLOB")
    } finally conn.close()
  }

  test("S9: append mode adds rows without touching existing ones") {
    seed("users_app")
    val more = Seq((6, "Frank", "frank@example.com", 3.5))
      .toDF("user_id", "user_name", "user_email", "total_hours")
    Sinks.jdbc(more, url, "users_app", SaveMode.Append, batchSize = 1,
      options = opts)
    val back = Sources.jdbc(spark, url, "users_app", opts)
    assert(back.count() === 6)
    assert(back.filter(col("user_id") === 6).count() === 1)
    assert(back.filter(col("user_id") === 1).count() === 1)
  }

  test("S3: partitioned parallel read returns the same data in N partitions") {
    seed("users_par")
    val par = Sources.jdbc(spark, url, "users_par", opts ++ Map(
      "partitionColumn" -> "user_id",
      "lowerBound" -> "1", "upperBound" -> "7", "numPartitions" -> "3"))
    assert(par.rdd.getNumPartitions === 3)
    val serial = Sources.jdbc(spark, url, "users_par", opts)
    assert(par.orderBy("user_id").collect().toSeq ===
      serial.orderBy("user_id").collect().toSeq)
  }

  test("S3: predicate and projection push into the JDBC source") {
    seed("users_push")
    val q = Sources.jdbc(spark, url, "users_push", opts)
      .filter(col("user_id") > 3).select("user_id", "user_name")
    // JDBCRelation prints PushedFilters in the physical plan explain.
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("USER_ID") ||
      plan.toLowerCase.contains("user_id"), s"no pushdown evidence in:\n$plan")
    assert(q.count() === 2) // ids 4 and 5 of the five seeded rows
  }
}

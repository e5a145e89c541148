package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the CONTRACT between the driver-generated parquet fixtures and the
  * query surface — every assumption an oracle or operator quietly relies
  * on, asserted in one place with a pointed message. The round-5 fixture
  * regeneration (events.ts INT64-nanos → TIMESTAMP_NTZ) broke 17 queries
  * whose symptoms were scattered hash mismatches; this spec exists so the
  * NEXT physical-shape drift fails here first, by name. Runs on sf0.001
  * (500–6000 rows/table) through [[Sources.table]] — the normalization
  * layer IS part of the contract under test. */
class FixtureContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def t(name: String) = Sources.table(spark, dir, name)

  private def assertCols(name: String, want: (String, DataType)*): Unit = {
    val got = t(name).schema.map(f => f.name -> f.dataType).toMap
    want.foreach { case (c, dt) =>
      assert(got.contains(c), s"$name: column '$c' missing (fixture " +
        s"regenerated with a different schema? present: ${got.keys.toSeq.sorted})")
      assert(got(c) == dt, s"$name.$c: expected $dt through Sources.table, " +
        s"got ${got(c)} — a physical-type drift the normalization layer no " +
        "longer maps")
    }
  }

  test("TPC-H-ish tables expose the columns and types the queries bind to") {
    assertCols("lineitem",
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      // the DATE columns ride as NTZ micros un-normalized (only events.ts
      // goes through normalizeTs): every consumer is date-grain, and under
      // the pinned UTC session NTZ and session-zoned timestamps yield
      // identical dates — but a regeneration to a third shape should land
      // here, not in 17 oracle mismatches
      "l_shipdate" -> TimestampNTZType)
    assertCols("orders",
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampNTZType)
    assertCols("customer",
      "c_custkey" -> LongType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType)
    assertCols("nation", "n_nationkey" -> IntegerType,
      "n_regionkey" -> IntegerType)
    assertCols("region", "r_regionkey" -> IntegerType, "r_name" -> StringType)
    assertCols("supplier", "s_suppkey" -> LongType,
      "s_nationkey" -> IntegerType)
    assertCols("part", "p_partkey" -> LongType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType)
  }

  test("events.ts normalizes to session-zoned TimestampType, never null") {
    // the r5 breakage class: whatever physical shape ts ships in (INT64
    // nanos, NTZ micros, UTC micros — all three have shipped),
    // Sources.table must surface one session-zoned TimestampType
    assertCols("events",
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType)
    val e = t("events")
    assert(e.filter(col("ts").isNull).count() == 0,
      "events.ts has nulls — the event-time operators (windows, " +
        "sessionization, watermarks) assume a non-null event time")
  }

  test("documents: distinct non-null doc_id, non-null text, 'en' present") {
    assertCols("documents", "doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType)
    val d = t("documents")
    val r = d.agg(
      count(lit(1)).as("n"),
      countDistinct(col("doc_id")).as("d"),
      count(when(col("text").isNull || col("doc_id").isNull, 1)).as("nulls"),
      count(when(col("lang") === "en", 1)).as("en")).head()
    assert(r.getAs[Long]("d") == r.getAs[Long]("n"),
      "documents.doc_id is not unique — dedup oracles key pairs on it")
    assert(r.getAs[Long]("nulls") == 0,
      "null doc_id/text rows — the text family assumes none")
    assert(r.getAs[Long]("en") > 0,
      "no lang='en' docs — DSIR's target predicate selects an empty set")
  }

  test("embeddings: 64-dim float vectors, distinct vec_id") {
    assertCols("embeddings", "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
    val e = t("embeddings")
    val dims = e.select(size(col("embedding")).as("d")).distinct().collect()
      .map(_.getInt(0)).toSeq
    assert(dims == Seq(64),
      s"embedding dims $dims != {64} — IVF/SQ8/LSH constants and the " +
        "recall fixtures assume a constant 64")
    assert(e.select(countDistinct(col("vec_id"))).head().getLong(0)
      == e.count(), "vec_id not unique — ANN top-k keys on it")
  }
}

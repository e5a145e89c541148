package graft.plans

import graft.SparkSpec
import graft.functions.{CosineSimilarityExpr, DotProductExpr, VectorFunctions}
import org.apache.spark.sql.DataFrame

class RewriteVectorOpsSpec extends SparkSpec {

  // Cloned sessions so the rule does not leak into other suites' plans.
  // s2 runs legacy arithmetic (full cosine collapse legal); s3 keeps
  // Spark 4's ANSI default, where zero-norm division must still raise
  // DIVIDE_BY_ZERO — only the dot-level fusion may fire there.
  private lazy val s2 = {
    val s = spark.newSession()
    s.conf.set("spark.sql.ansi.enabled", "false")
    s.experimental.extraOptimizations = Seq(RewriteVectorOps)
    s
  }
  private lazy val s3 = {
    val s = spark.newSession()
    s.conf.set("spark.sql.ansi.enabled", "true")
    s.experimental.extraOptimizations = Seq(RewriteVectorOps)
    s
  }

  // parquet-backed (a LocalRelation would be constant-folded away before
  // the optimized plan can be inspected)
  private def vecs(s: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.io.Sources.table(s, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("a"),
        reverse(col("embedding")).as("b"))
  }

  private def exprsOf(df: DataFrame) =
    df.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case e => e })

  test("HOF dot product rewrites to DotProductExpr") {
    val df = vecs(s2).select(
      VectorFunctions.dotHof(org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")).as("d"))
    assert(exprsOf(df).exists(_.isInstanceOf[DotProductExpr]),
      df.queryExecution.optimizedPlan.toString)
  }

  test("HOF cosine rewrites all the way to CosineSimilarityExpr") {
    val df = vecs(s2).select(
      VectorFunctions.cosineHof(org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")).as("c"))
    val es = exprsOf(df)
    assert(es.exists(_.isInstanceOf[CosineSimilarityExpr]),
      df.queryExecution.optimizedPlan.toString)
    assert(!es.exists(_.isInstanceOf[DotProductExpr]),
      "partial rewrite left bare dots in the cosine pattern")
  }

  test("ANSI sessions fuse dots but keep the error-raising Divide") {
    val df = vecs(s3).select(
      VectorFunctions.cosineHof(org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")).as("c"))
    val es = exprsOf(df)
    assert(es.exists(_.isInstanceOf[DotProductExpr]),
      "dot fusion is mode-independent and must still fire")
    assert(!es.exists(_.isInstanceOf[CosineSimilarityExpr]),
      "collapsing the ANSI Divide would turn DIVIDE_BY_ZERO into NaN")
  }

  test("rewritten plans produce bitwise-identical results") {
    import org.apache.spark.sql.functions.col
    val plain = vecs(spark)
      .select(col("id"), VectorFunctions.cosineHof(col("a"), col("b")).as("c"),
        VectorFunctions.dotHof(col("a"), col("b")).as("d"))
      .orderBy("id").collect().toSeq
    val rewritten = vecs(s2)
      .select(col("id"), VectorFunctions.cosineHof(col("a"), col("b")).as("c"),
        VectorFunctions.dotHof(col("a"), col("b")).as("d"))
      .orderBy("id").collect().toSeq
    assert(rewritten == plain)
  }

  test("SQL-authored HOF pattern is rewritten too") {
    vecs(s2).createOrReplaceTempView("rw_vecs")
    val df = s2.sql(
      """SELECT aggregate(zip_with(CAST(a AS ARRAY<DOUBLE>),
        |                          CAST(b AS ARRAY<DOUBLE>),
        |                          (x, y) -> x * y),
        |                 CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d
        |FROM rw_vecs""".stripMargin)
    assert(exprsOf(df).exists(_.isInstanceOf[DotProductExpr]),
      df.queryExecution.optimizedPlan.toString)
  }

  test("non-matching aggregates are left alone") {
    import org.apache.spark.sql.functions._
    // sum instead of product: must NOT rewrite
    val df = vecs(s2).select(aggregate(
      zip_with(col("a").cast("array<double>"), col("b").cast("array<double>"),
        (x, y) => x + y),
      lit(0.0d), (acc, x) => acc + x).as("s"))
    assert(!exprsOf(df).exists(_.isInstanceOf[DotProductExpr]))
    df.collect() // and still executes
  }
}

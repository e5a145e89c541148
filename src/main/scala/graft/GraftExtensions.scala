package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.CosineSimilarityExpr

/** SQL-surface registration for graft's native expressions.
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build time
  *    (the standard extensions hook — works for pure-SQL users);
  *  - [[GraftExtensions.register]] on a live session (temp-function
  *    registry), used by tests and notebook sessions.
  *
  * After either, `SELECT cosine_similarity(a.embedding, b.embedding)` runs
  * the codegen'd expression — no UDF, full whole-stage codegen.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineDescriptor)
  }
}

object GraftExtensions {

  private def build(args: Seq[Expression]): Expression = {
    require(args.length == 2,
      s"cosine_similarity expects 2 arguments, got ${args.length}")
    CosineSimilarityExpr(args(0), args(1))
  }

  val cosineDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_similarity"),
    new ExpressionInfo(classOf[CosineSimilarityExpr].getName,
      "cosine_similarity"),
    build,
  )

  /** Register on an existing session (temp function registry). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", build, "built-in")
}

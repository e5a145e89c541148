package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.IntegerType

import graft.functions.{CosineSimilarityExpr, RollingHashExpr}

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
    ext.injectFunction(GraftExtensions.rollingHashDescriptor)
    // HOF vector patterns → fused codegen expressions (bitwise-preserving)
    ext.injectOptimizerRule(_ => graft.plans.RewriteVectorOps)
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

  private def buildRolling(args: Seq[Expression]): Expression = {
    require(args.length == 3,
      s"rolling_hash expects (str, k, stride), got ${args.length} args")
    def intLit(e: Expression, name: String): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"rolling_hash: $name must be an integer literal, got $other")
    }
    RollingHashExpr(args.head, intLit(args(1), "k"), intLit(args(2), "stride"))
  }

  val rollingHashDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("rolling_hash"),
    new ExpressionInfo(classOf[RollingHashExpr].getName, "rolling_hash"),
    buildRolling,
  )

  /** Register on an existing session (temp function registry). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", build, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", buildRolling, "built-in")
  }
}

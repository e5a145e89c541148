package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = {
    val r = new scala.util.Random(1234)
    (0L until 200L).map(i => (i, Array.fill(64)(r.nextGaussian().toFloat)))
      .toDF("id", "v")
  }

  test("codegen cosine expression is bitwise identical to the HOF formula") {
    val pairs = vecs.select($"id".as("ia"), $"v".as("va"))
      .crossJoin(vecs.select($"id".as("ib"), $"v".as("vb")))
      .filter($"ia" < $"ib").limit(5000)
    val diffs = pairs.select(
      VectorFunctions.cosine($"va", $"vb").as("fast"),
      VectorFunctions.cosineHof($"va", $"vb").as("ref"))
      .filter($"fast" =!= $"ref")
    assert(diffs.isEmpty)
  }

  test("codegen dot is bitwise identical to the HOF formula, incl. literal side") {
    val pairs = vecs.select($"id".as("ia"), $"v".as("va"))
      .crossJoin(vecs.select($"id".as("ib"), $"v".as("vb")))
      .filter($"ia" < $"ib").limit(5000)
    val diffs = pairs.select(
      VectorFunctions.dot($"va", $"vb").as("fast"),
      VectorFunctions.dotHof($"va", $"vb").as("ref"))
      .filter($"fast" =!= $"ref")
    assert(diffs.isEmpty)
    // the signLsh shape: int-literal plane weights on the right
    val w = Array(1, -1, 1, 1, -1, 1, -1, 1)
    val d8 = vecs.select($"id", slice($"v", 1, 8).as("v8"))
    val diffs2 = d8.select(
      VectorFunctions.dot($"v8", lit(w)).as("fast"),
      VectorFunctions.dotHof($"v8", lit(w)).as("ref"))
      .filter($"fast" =!= $"ref")
    assert(diffs2.isEmpty)
  }

  test("cosine of a vector with itself is 1.0; orthogonal is 0.0") {
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f), Array(0.0f, 3.0f)))
      .toDF("a", "a2", "b")
    val r = df.select(
      VectorFunctions.cosine($"a", $"a2").as("same"),
      VectorFunctions.cosine($"a", $"b").as("orth")).head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
  }

  test("null array yields null similarity") {
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    assert(df.select(VectorFunctions.cosine($"a", $"b")).head().isNullAt(0))
  }

  test("zero-norm vector yields null (legacy SQL divide-by-zero is null)") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    assert(df.select(VectorFunctions.cosine($"a", $"b")).head().isNullAt(0),
      "undefined cosine must surface as NULL, not NaN")
  }

  test("null ELEMENT yields null in codegen and HOF paths alike") {
    val df = Seq((Seq(Some(1.0f), None), Seq(Some(1.0f), Some(2.0f))))
      .toDF("a", "b")
    assert(df.select(VectorFunctions.cosine($"a", $"b")).head().isNullAt(0))
    assert(df.select(VectorFunctions.cosineHof($"a", $"b")).head().isNullAt(0))
  }

  test("length-mismatched arrays yield null, like the HOF formulation") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    // codegen path (inside a projection over a real plan)
    val fast = df.select(VectorFunctions.cosine($"a", $"b").as("c"))
    assert(fast.head().isNullAt(0),
      "codegen path must not silently truncate to the shorter array")
    // the HOF reference formulation agrees (zip_with null-pads → null)
    val hof = df.select(VectorFunctions.cosineHof($"a", $"b").as("c"))
    assert(hof.head().isNullAt(0))
    // interpreted path: eval the expression directly, outside codegen
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    val conv = CatalystTypeConverters
      .createToCatalystConverter(new org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, false))
    val expr = CosineSimilarityExpr(
      Literal(conv(Array(1.0f, 2.0f, 3.0f)),
        new org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, false)),
      Literal(conv(Array(1.0f, 2.0f)),
        new org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, false)))
    assert(expr.eval(null) == null)
  }
}

package graft

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_similarity is callable from SQL after registration") {
    GraftExtensions.register(spark)
    Seq((Array(1.0f, 0.0f), Array(0.5f, 0.0f)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val r = spark.sql(
      "SELECT cosine_similarity(a, b) AS c FROM vecs").head()
    assert(r.getDouble(0) == 1.0)
  }

  test("rolling_hash is callable from SQL with literal window args") {
    GraftExtensions.register(spark)
    Seq("abcdefghij").toDF("t").createOrReplaceTempView("rh")
    val arr = spark.sql("SELECT rolling_hash(t, 4, 2) AS h FROM rh")
      .head().getSeq[Long](0)
    assert(arr.nonEmpty)
    // non-literal k must be rejected, not silently miscomputed
    intercept[Exception] {
      spark.sql("SELECT rolling_hash(t, length(t), 2) FROM rh").collect()
    }
  }

  test("extensions hook applies cleanly to a SparkSessionExtensions") {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(e) // injectFunction must accept the descriptor
  }
}

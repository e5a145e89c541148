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

  test("extensions hook applies cleanly to a SparkSessionExtensions") {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(e) // injectFunction must accept the descriptor
  }
}

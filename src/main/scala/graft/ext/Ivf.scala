package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.io.Sources.scatter

/** IVF (inverted-file) ANN index with a TRAINED coarse quantizer — the real
  * version of the label-as-cell stand-in in [[Similarity.ivfTopK]].
  *
  * Build: k-means (Spark MLlib — Lloyd's with fixed seed, deterministic for
  * a given input) over the corpus (sample upstream with `df.sample` when
  * training cost matters — Lloyd's runs maxIter full passes); every vector
  * is assigned to its nearest centroid cell, and the assignment table KEEPS
  * the vector so search never joins back to the corpus. Search: score the
  * query against the C centroids (tiny), take the `nprobe` nearest cells,
  * and scan ONLY those cells' vectors via a broadcast join on cell — no
  * corpus shuffle at all; the cosine work is ≈ nprobe/C of the corpus.
  *
  * ANN trade-off is explicit: recall < 1 (bounded in IvfSpec against brute
  * force); raise `nprobe` to trade latency for recall.
  */
object Ivf {

  /** `assignments` carries (id, cell, vector) — the celled corpus itself. */
  /** `release()` unpersists the staged vectorized corpus the build
    * cached for its fit/transform passes — call when the index owner
    * (e.g. ExtensionQueries.ivfMemo) is dropped; consumers re-reading
    * `assignments` afterwards recompute from the source scan. */
  final case class Index(centroids: DataFrame, assignments: DataFrame,
                         private val staged: DataFrame = null) {
    def release(): Unit = if (staged != null) {
      staged.unpersist(blocking = false); ()
    }
  }

  /** Train the quantizer and assign every vector to a cell. */
  def build(emb: DataFrame, cells: Int = 16, seed: Long = 42L,
            idCol: String = "vec_id", vecCol: String = "embedding"): Index = {
    // persist: fit() makes maxIter passes and transform() one more — the
    // scatter+cast+vectorize pipeline must not recompute each time.
    // Released via Index.release() when the owning memo is dropped.
    val vecs = scatter(emb.select(col(idCol), col(vecCol)))
      .withColumn("features",
        array_to_vector(col(vecCol).cast("array<double>")))
      .persist()
    val model = new KMeans().setK(cells).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(vecs)
    val assignments = model.transform(vecs)
      .select(col(idCol), col("cell"), col(vecCol))
    val ss = emb.sparkSession
    import ss.implicits._
    val centroids = model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray) }
      .toDF("cell", "centroid")
    Index(centroids, assignments, staged = vecs)
  }

  /** The nprobe-nearest-cells probe set per query — deterministic (probe
    * ranking on 6-dp rounded cosine + cell tie-break, so the searched
    * cells are engine-stable) and tiny (nprobe rows per query). */
  private def probedCells(index: Index, queries: DataFrame, nprobe: Int,
                          idCol: String, vecCol: String): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val cellRank = Window.partitionBy(col("query_id"))
      .orderBy(col("c_sim").desc, col("cell").asc)
    q.crossJoin(broadcast(index.centroids))
      .withColumn("c_sim",
        VectorFunctions.cosineRounded(col("qv"), col("centroid"), 6))
      .withColumn("crn", row_number().over(cellRank))
      .filter(col("crn") <= nprobe)
      .select(col("query_id"), col("qv"), col("cell"))
  }

  /** Score the probed (query, cell) set against the celled corpus — a
    * broadcast equi-join on cell; no corpus-side exchange. */
  private def scoreProbed(celled: DataFrame, probed: DataFrame, k: Int,
                          idCol: String, vecCol: String): DataFrame = {
    val scored = celled
      .select(col(idCol), col("cell"), col(vecCol).as("cv"))
      .join(broadcast(probed), Seq("cell"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("cosine",
        VectorFunctions.cosineRounded(col("qv"), col("cv")))
      .withColumnRenamed(idCol, "vec_id")
    Similarity.topKViaAggregator(scored, k)
  }

  /** Top-k search probing the `nprobe` nearest cells per query. */
  def search(index: Index, queries: DataFrame, k: Int = 5,
             nprobe: Int = 2, idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame =
    scoreProbed(index.assignments,
      probedCells(index, queries, nprobe, idCol, vecCol), k, idCol, vecCol)

  /** [[search]] over a cell-PARTITIONED assignments layout — the trained-
    * quantizer twin of [[Similarity.sq8IvfTopKPruned]]. [[search]]'s
    * broadcast probe join never shuffles the corpus but still READS all N
    * assignment rows per search; storing the assignments hive-partitioned
    * on `cell` (`Sinks.parquet(index.assignments, path,
    * partitionBy = Seq("cell"))` — the natural write-once step of the
    * index build) and restricting the scan to the probed cell set turns
    * the read itself into static partition pruning: ~nprobe·|queries|
    * cells of IO instead of N rows. The probed-cell collect is bounded
    * (nprobe rows per query — the same traffic the probe broadcast
    * already carries) and the restriction is lossless (the scoring join
    * is an equi-join on cell). Construct the index as
    * `Index(centroids, spark.read.parquet(celledPath))`; result equality
    * with [[search]] and the PartitionFilters scan shape are pinned in
    * IvfSpec. */
  def searchPruned(index: Index, queries: DataFrame, k: Int = 5,
                   nprobe: Int = 2, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    // Materialize the probe ranking ONCE: the collect below already pays
    // for the query×centroid scoring pass, so the scoring join reuses the
    // collected rows as a local relation instead of re-running the cross
    // join + window a second time (the probed set is ≤ nprobe·|queries|
    // rows — broadcast-sized by construction).
    val probedDf = probedCells(index, queries, nprobe, idCol, vecCol)
    val rows = probedDf.collect()
    val cellIdx = probedDf.schema.fieldIndex("cell")
    val cells = rows.map(_.get(cellIdx)).distinct.toSeq
    val spark = queries.sparkSession
    val probed = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), probedDf.schema)
    scoreProbed(index.assignments.filter(col("cell").isInCollection(cells)),
      probed, k, idCol, vecCol)
  }
}

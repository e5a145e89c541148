package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store sizing for stateful streams.
  *
  * A stateful streaming query creates one state store PER SHUFFLE
  * PARTITION per stateful operator, and every micro-batch pays store
  * load/commit/snapshot once per store — so partition count is a
  * per-trigger FIXED cost, sized by expected state volume, not by batch
  * scan parallelism (whose default it would otherwise inherit). The
  * count is pinned into the checkpoint at first run, which makes it a
  * deployment decision, exactly like choosing bucket counts for tables.
  * For the fixture-scale streams here 8 stores are plenty (measured:
  * the stream-stream join drops 9.7 s → 3.0 s at sf0.1 vs inheriting
  * the 32-way batch default); a production stream carrying more
  * in-watermark state sizes up before FIRST start. Results are
  * partition-count-independent (the determinism contract) — only cost
  * moves.
  */
object StreamConf {
  def sized[T](spark: SparkSession, partitions: Int = 8)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, partitions.toString)
    try body
    finally saved.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }
}

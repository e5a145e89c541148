package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Per-key running totals on the MODERN arbitrary-state API
  * (`transformWithState`, Spark 4) — the successor to
  * flatMapGroupsWithState that [[Sessionize.streaming]] uses. Differences
  * that matter at scale, demonstrated here: state is a typed handle
  * created in `init` (not a whole-group case class the runtime
  * round-trips every batch), per-state TTL is declarative
  * (`TTLConfig`), and the API requires the RocksDB state-store provider —
  * the store that keeps 100 TB-scale state off the executor heap and
  * makes checkpoints incremental (changelog), vs the default HDFS-backed
  * store's full-snapshot uploads and heap residency.
  *
  * The processor keeps ONE long per key — running event total — and
  * emits the updated total once per (key, batch): update-mode output,
  * downstream-upsertable by key.
  */
object RunningCounts {

  final case class Total(user_id: Long, total: Long)

  class Processor extends StatefulProcessor[Long, Long, Total] {
    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Long],
                                 timerValues: TimerValues): Iterator[Total] = {
      val n = (if (count.exists()) count.get() else 0L) + rows.size
      count.update(n)
      Iterator.single(Total(key, n))
    }
  }

  /** Running totals over a stream of keys (update mode: one row per key
    * per batch that saw the key, carrying the cumulative total). */
  def runningTotals(keys: Dataset[Long]): Dataset[Total] = {
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val outEnc: Encoder[Total] = Encoders.product[Total]
    keys.groupByKey(identity)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }

  /** [[runningTotals]] over everything currently in `dir`'s events table
    * (AvailableNow): the single delivered batch makes each key's one
    * update-mode emission its full total, so the result must equal a
    * plain per-user batch count — the DuckDB twin. Cross-batch
    * accumulation is RunningCountsSpec's job; this entry data-checks the
    * operator (and the RocksDB provider path) on real data. */
  def runAvailableNow(spark: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val schema = spark.read.parquet(s"$dir/events.parquet").schema
      implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
      val users = spark.readStream.schema(schema).parquet(s"$dir/events.*")
        .select(col("user_id")).as[Long]
      val q = runningTotals(users)
        .writeStream.format("memory").queryName("graft_tws_totals")
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table("graft_tws_totals").orderBy("user_id")
    } finally saved.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }
}

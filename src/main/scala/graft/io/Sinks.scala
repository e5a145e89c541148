package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Writers (SURVEY §2.1 S5-S9).
  *
  * The reference stages KPI CSVs to S3 then `COPY`s into Redshift with
  * append-on-rerun duplicate semantics (reference:
  * dags/music_streaming_services_dag.py:288-353; bug noted in SURVEY §2.11-2).
  * We default every sink to idempotent overwrite. At scale, prefer
  * partitioned parquet over CSV: column pruning, predicate pushdown, and
  * per-partition overwrite all depend on it.
  */
object Sinks {

  /** S5/S6 — CSV sink with header. `singleFile = true` only for small-result
    * parity with the reference's one-file-per-table staging; never coalesce(1)
    * a large dataset. */
  def csv(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
  }

  /** Parquet sink, optionally partitioned (the 100 TB default: partition KPI
    * outputs by date so daily reruns overwrite only their own partition). */
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
              dynamicPartitionOverwrite: Boolean = true): Unit = {
    val w0 = df.write.mode(SaveMode.Overwrite)
    val w1 = if (partitionBy.nonEmpty) {
      val w = w0.partitionBy(partitionBy: _*)
      if (dynamicPartitionOverwrite)
        w.option("partitionOverwriteMode", "dynamic")
      else w
    } else w0
    w1.parquet(path)
  }

  /** Bucketed managed table: co-locates future joins/aggregations on
    * `bucketCols` — two tables bucketed the same way join with NO exchange
    * on either side (verified in ScaleSpec by plan inspection). At 100 TB
    * this is the difference between re-shuffling the fact table per join and
    * never shuffling it at all; sortBy makes the merge join zip directly.
    *
    * Overwrite is made idempotent ACROSS JVMs: a fresh in-memory catalog
    * does not know about a previous process's table, but its managed
    * LOCATION survives on disk and saveAsTable refuses to reuse it
    * (LOCATION_ALREADY_EXISTS) — so any stale location is dropped first.
    * The location comes from the catalog itself (recorded location when the
    * table exists, the catalog's defaultTablePath otherwise), so non-default
    * warehouse layouts and non-local warehouse URIs are handled; deletion
    * goes through the Hadoop FileSystem for the same reason. Qualified
    * (`db.tbl`) or path-like names are rejected rather than guessed at. */
  def bucketedTable(df: DataFrame, name: String, bucketCols: Seq[String],
                    buckets: Int = 64): Unit = {
    require(!name.contains(".") && !name.contains("/") && !name.contains("\\"),
      s"bucketedTable takes a simple table name in the current database, got: $name")
    val spark = df.sparkSession
    val loc = org.apache.spark.sql.GraftShims.tableLocation(spark, name)
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(name)
  }

  /** Crash-safely REPLACE a bucketed managed table with `df` — the
    * bucketed-table twin of [[upsertParquet]]'s checked swap. The staged
    * twin table (`name__staged`) is written COMPLETELY first, so the
    * only full copy of the data is never dropped before its replacement
    * exists; then a catalog drop + rename commits the swap, and the
    * commit is verified (`ALTER TABLE RENAME` moves a managed table's
    * directory with it, so the new table keeps a managed location).
    * `df` may read from `name` itself — store compaction does — because
    * the staged write consumes the old rows before anything is dropped.
    *
    * Crash-safe, NOT atomic: the catalog commit is two statements, and
    * a crash between the DROP and the RENAME leaves no table under
    * `name` (the complete staged table survives on disk and in the
    * catalog, so no DATA is ever lost — but the name is briefly
    * unbound, and concurrent readers can observe the window). The next
    * call to this method SELF-HEALS that state: on entry, if `name` is
    * missing while `name__staged` exists, the interrupted rename is
    * completed first (the staged table is by construction a fully
    * written replacement — it is only ever created by this method,
    * after its write finished), then the new replacement proceeds
    * against the recovered table. [[recoverReplacedTable]] exposes the
    * same recovery for READERS that hit the window. */
  def replaceBucketedTable(df: DataFrame, name: String,
                           bucketCols: Seq[String],
                           buckets: Int = 64): Unit = {
    require(!name.contains(".") && !name.contains("/"),
      s"replaceBucketedTable takes a simple table name, got: $name")
    val spark = df.sparkSession
    recoverReplacedTable(spark, name)
    val staged = name + "__staged"
    bucketedTable(df, staged, bucketCols, buckets)
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    spark.sql(s"ALTER TABLE `$staged` RENAME TO `$name`")
    require(spark.catalog.tableExists(name),
      s"swap: rename $staged -> $name did not commit")
  }

  /** Complete an interrupted [[replaceBucketedTable]] swap: when `name`
    * is absent but `name__staged` exists, the process died between the
    * DROP and the RENAME — the staged table IS the fully written
    * replacement, so finish the rename. Idempotent (no-op when `name`
    * exists or no staged twin is present); returns true when a recovery
    * was performed. Store readers call this before `spark.table(name)`
    * to self-heal the crash window instead of failing on a missing
    * table. */
  def recoverReplacedTable(spark: org.apache.spark.sql.SparkSession,
                           name: String): Boolean = {
    val staged = name + "__staged"
    val recover = !spark.catalog.tableExists(name) &&
      spark.catalog.tableExists(staged)
    if (recover) {
      spark.sql(s"ALTER TABLE `$staged` RENAME TO `$name`")
      require(spark.catalog.tableExists(name),
        s"recovery: rename $staged -> $name did not commit")
    }
    recover
  }

  /** Keyed upsert (MERGE emulation) into a parquet location — the "upsert
    * strategy" the reference's problem statement asked for and never got
    * (SURVEY §2.9: Redshift COPY appends, so reruns duplicate). Read the
    * existing table, union the updates, keep the newest row per key
    * (version DESC, updates win ties), and atomically swap the directory.
    * At warehouse scale this is what table formats do per-file; here it is
    * per-location — correct, idempotent, and crash-safe (the swap is two
    * renames; the old data survives until the new write commits). */
  def upsertParquet(updates: DataFrame, path: String, keys: Seq[String],
                    versionCol: String): Unit = {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val spark = updates.sparkSession
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(path)
    val merged =
      if (!fs.exists(target)) updates
      else {
        val existing = spark.read.parquet(path)
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(col(versionCol).desc, col("_is_update").desc)
        existing.withColumn("_is_update", lit(0))
          .unionByName(updates.withColumn("_is_update", lit(1)))
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn", "_is_update")
      }
    writeAndSwap(merged, path)
  }

  /** Additive-state merge sink: fold a batch's keyed PARTIAL sums into
    * the persisted state by summing every non-key column per key — the
    * foreachBatch pattern for RETRACTABLE streaming aggregates (signed
    * multiplicities arrive as negative partials and cancel exactly).
    * State stays at key grain, updates cost one keyed merge of
    * |state| + |batch partials|, and the commit is the same atomic
    * two-rename swap as upsertParquet. Decimal sums widen to their
    * precision cap on first merge and are stable thereafter.
    *
    * FENCED partials must be BITWISE-deterministic under replay: the
    * content fence hashes the raw bytes of every column, so the same
    * batch must reproduce byte-identical rows. Long and decimal sums do
    * (exact arithmetic, any partitioning); DOUBLE sums generally do NOT —
    * fp summation order varies with partitioning/AQE, so a legitimate
    * replay can hash differently and be rejected as a changed batch.
    * Carry floating-point aggregates as decimals (cast before the
    * partial agg, as the in-repo callers do) or merge them unfenced. */
  /** An additive merge is NOT idempotent (applying a batch twice doubles
    * it), so exactly-once needs the applied-batch set committed in the
    * SAME atomic swap as the data. The fence is the pair
    * (batchId, CONTENT hash): the hash is an order-independent BIGINT
    * XOR of xxhash64 over the batch's partial rows, so
    *  - a true replay (same id, same rows) is skipped wholesale;
    *  - a replay whose COMPOSITION changed (same id, different rows —
    *    a re-planned source after checkpoint loss) FAILS LOUDLY instead
    *    of being silently dropped: the state cannot be reconciled
    *    additively and must be rebuilt from scratch. Fencing on the bare
    *    batchId would drop the changed data without a trace.
    * The applied set lives in ONE `_applied_batches` file (a line per
    * `id:hash`), rewritten into the staging dir before the rename — data
    * and bookkeeping commit in one atomic move, and markers never
    * accumulate as per-batch files (legacy `_applied_batch_<id>` marker
    * files from older state dirs are folded in as hashless entries that
    * match any replay of their id). Spark readers skip `_`-prefixed
    * files. Contrast upsertParquet, which tolerates replay by being
    * idempotent instead. */
  def mergeAdditive(partial: DataFrame, path: String, keys: Seq[String],
                    batchId: Option[Long] = None): Unit = {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.functions._
    val spark = partial.sparkSession
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(new Path(path))
    // applied set: the compacted file plus any legacy per-batch markers
    val appliedFile = new Path(path, "_applied_batches")
    val applied: Map[Long, Option[Long]] = if (!exists) Map.empty else {
      val fromFile =
        if (!fs.exists(appliedFile)) Seq.empty
        else {
          val in = fs.open(appliedFile)
          val text = try new String(
            org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
          finally in.close()
          text.split("\n").toSeq.filter(_.nonEmpty).map { line =>
            val Array(id, h) = line.split(":", 2)
            id.toLong -> (if (h == "?") None else Some(h.toLong))
          }
        }
      val legacy = fs.listStatus(new Path(path)).toSeq
        .map(_.getPath.getName).filter(_.startsWith("_applied_batch_"))
        .map(m => m.stripPrefix("_applied_batch_").toLong -> None)
      (legacy ++ fromFile).toMap // file entries win over legacy hashless
    }
    val fenced = batchId.isDefined
    // one extra tiny job per batch: partial is already aggregated to key
    // grain, so the hash pass is O(|partials|), not O(|batch|)
    if (fenced) partial.persist()
    try {
      // bit_xor, not sum: order-independent like sum but cannot overflow
      // under ANSI mode; XOR self-cancellation of duplicate rows is moot
      // because partials are unique per key group
      val contentHash: Long = if (!fenced) 0L else {
        val r = partial.select(bit_xor(xxhash64(
          partial.columns.map(col): _*)).as("h")).collect()(0)
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }
      batchId.filter(applied.contains) match {
        case Some(b) =>
          applied(b) match {
            case Some(h) if h != contentHash =>
              throw new IllegalStateException(
                s"mergeAdditive: batch $b replayed with DIFFERENT content " +
                s"(applied hash $h, incoming $contentHash) — additive state " +
                s"at $path cannot reconcile a re-planned batch; rebuild it")
            case None =>
              // legacy marker predates the content fence: it matches ANY
              // replay of its id, so a changed-composition replay would be
              // dropped here unverified — surface that the strong check
              // could not run for this batch
              System.err.println(s"[mergeAdditive] batch $b at $path " +
                "skipped on a LEGACY hashless marker — replay content " +
                "could not be verified against the applied batch")
              return
            case _ => return // true replay (hash matched) — no-op
          }
        case None =>
      }
      val merged =
        if (!exists) partial
        else {
          val sums = partial.columns.filterNot(keys.contains)
            .map(c => sum(col(c)).as(c))
          spark.read.parquet(path).unionByName(partial)
            .groupBy(keys.map(col): _*)
            .agg(sums.head, sums.tail: _*)
        }
      val appliedOut = applied ++ batchId.map(_ -> Some(contentHash))
      val lines = appliedOut.toSeq.sortBy(_._1)
        .map { case (id, h) => s"$id:${h.fold("?")(_.toString)}" }
      writeAndSwap(merged, path,
        if (lines.isEmpty) Map.empty
        else Map("_applied_batches" -> lines.mkString("", "\n", "\n")))
    } finally if (fenced) partial.unpersist()
  }

  /** Write `df` to a temp location next to `path`, then atomically swap
    * it into place (two renames; the old data survives until the new
    * write commits — crash-safe, shared by upsert and compaction). */
  private def writeAndSwap(df: DataFrame, path: String,
                           markerFiles: Map[String, String] = Map.empty)
      : Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val target = new Path(path)
    val tmp = new Path(path + "._graft_tmp")
    fs.delete(tmp, true)
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // markers land in the staging dir BEFORE the rename, so data and
    // applied-batch bookkeeping commit in one atomic move
    markerFiles.foreach { case (m, content) =>
      val out = fs.create(new Path(tmp, m), true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
    }
    val old = new Path(path + "._graft_old")
    fs.delete(old, true)
    // Check every rename: Hadoop rename returns false on failure (and on
    // some stores renames INTO an existing dir) — proceeding blindly could
    // delete the only pre-merge copy. Fail loudly instead; the backup is
    // only dropped once the new data is in place.
    if (fs.exists(target) && !fs.rename(target, old))
      throw new java.io.IOException(s"swap: cannot move $target aside")
    if (!fs.rename(tmp, target)) {
      if (fs.exists(old)) fs.rename(old, target) // restore the backup
      throw new java.io.IOException(s"swap: cannot commit $tmp -> $target")
    }
    fs.delete(old, true)
  }

  /** Small-file compaction: rewrite a parquet location into `targetFiles`
    * files and atomically swap it in. The operational fix for the
    * many-tiny-files problem every streaming/incremental sink creates —
    * at 100 TB, scan cost is dominated by file-open overhead once files
    * drop below ~100 MB, and compaction restores scan bandwidth without
    * changing a single row. Round-robin repartition (no shuffle key) is
    * deliberate: compaction must be layout-neutral; callers wanting
    * clustering compose with [[graft.ext.Layout.clusterByZ2]] instead.
    *
    * Hive-PARTITIONED locations are rejected: the flat read would fold
    * `col=value` directories into data columns and the rewrite would
    * swap in an UNPARTITIONED layout — partition pruning silently
    * degrading to full scans is worse than a refused compaction. Compact
    * partitioned tables per-partition (pass the leaf directory). */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetFiles: Int): Unit = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Probe existence first: listStatus on a missing/mistyped path throws a
    // raw Hadoop FileNotFoundException; fail with the same require-style
    // message shape as the partitioned-layout guard instead.
    require(fs.exists(p), s"compact: $path does not exist")
    val partitionDirs = fs.listStatus(p).filter(s =>
      s.isDirectory && s.getPath.getName.contains("="))
    require(partitionDirs.isEmpty,
      s"compact: $path is hive-partitioned (${partitionDirs.head.getPath
        .getName}, ...) — compacting would flatten the layout; " +
        "compact each leaf partition directory instead")
    writeAndSwap(spark.read.parquet(path).repartition(targetFiles), path)
  }

  /** S7-S9 — JDBC sink. Covers the reference's CREATE TABLE + batched
    * executemany (reference: users_to_rds.py:33-60, songs_to_rds.py:48-92) and
    * its Redshift COPY load (dags/music_streaming_services_dag.py:317-353):
    * `createTableColumnTypes` carries the DDL types (S7), `batchsize` the
    * insert batching (S9), SaveMode the overwrite-vs-append choice. Verified
    * end-to-end against embedded Derby in JdbcRoundTripSpec. `options` passes
    * driver-specific settings (e.g. the JDBC driver class). */
  def jdbc(df: DataFrame, url: String, tableName: String,
           mode: SaveMode = SaveMode.Overwrite,
           batchSize: Int = 5000,
           createTableColumnTypes: Option[String] = None,
           options: Map[String, String] = Map.empty): Unit = {
    val w0 = df.write.mode(mode).format("jdbc")
      .option("url", url).option("dbtable", tableName)
      .option("batchsize", batchSize.toString)
    val w1 = options.foldLeft(w0) { case (b, (k, v)) => b.option(k, v) }
    createTableColumnTypes.fold(w1)(t =>
      w1.option("createTableColumnTypes", t)).save()
  }
}

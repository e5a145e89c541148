package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * A query that THROWS leaves no parquet behind, and a compare that merely
  * iterates the dumps would silently omit it — an "all green" report over a
  * broken surface (exactly what masked the round-5 NTZ regression). So every
  * failure is also PERSISTED to `$outDir/_failures.json` (name → error), and
  * VerifyDumpSpec asserts that each queries key yields either a dump dir or
  * a failure record — a broken query can be red, never invisible. */
object Verify {

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL (or an exception message) would
    * otherwise make the driver's json.load fail and silently zero the
    * round's correctness. */
  def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def writeJsonMap(path: String, m: Map[String, String]): Unit =
    Files.writeString(Paths.get(path),
      m.map { case (k, v) => s"${jsonStr(k)}: ${jsonStr(v)}" }
        .mkString("{", ",", "}"))

  /** Dump every query in `qs`; returns the failure map (also persisted as
    * `$outDir/_failures.json` — written even when empty, so its absence
    * means "dump didn't finish", never "no failures"). */
  def dumpAll(spark: SparkSession, sfDir: String, outDir: String,
              qs: Map[String, (SparkSession, String) => DataFrame])
      : Map[String, String] = {
    new java.io.File(outDir).mkdirs()
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    qs.foreach { case (name, fn) =>
      // NonFatal ONLY (same policy as warmShared below): an OOM/linkage
      // error must abort the JVM, not be recorded and cascade into ~70
      // misleading failures on a corrupted session with exit 0
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case scala.util.control.NonFatal(e) =>
        val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"
        System.err.println(s"[verify] $name failed: $msg")
        failures(name) = msg
      }
      // per-query scratch caches (dedup self-join sides) die with the
      // query; streaming queries also unload the state-store providers
      // their per-run checkpoints registered (JVM-global — they outlive
      // the query and degrade the whole session otherwise)
      finally {
        ext.Dedup.releaseScratch()
        if (name.startsWith("streaming_"))
          streaming.StreamHygiene.release(spark)
      }
    }
    writeJsonMap(s"$outDir/_failures.json", failures.toMap)
    failures.toMap
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional substring filter for fast local iteration on a few queries;
    // the driver passes no pattern and always dumps the full surface
    val pattern = if (args.length > 2) args(2) else ""
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER lets the harness run the SAME differential under
    // `local-cluster[n,cores,mem]` — real Worker-launched executor JVMs,
    // which serialize every custom Expression / typed Aggregator / broadcast
    // over the wire, the one execution axis `local[*]` can never exercise
    // (there, "serialization" is a same-classloader no-op for broadcasts and
    // task binaries never cross a process boundary).
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      // overridable (sys.props default) for the same reason as adaptive
      // below: the memory-pressure sweep axis raises partition counts
      // under a constrained heap, and a hard-coded value here would
      // silently nullify that -D
      .config("spark.sql.shuffle.partitions",
        sys.props.getOrElse("spark.sql.shuffle.partitions", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      // default-on, but overridable: builder .config BEATS -D system
      // properties in Spark's precedence, so a hard-coded value here would
      // silently nullify a GRAFT_EXTRA_JAVA_OPTS AQE-off sweep (found in
      // round 9 — the r7 "AQE-off" matrix row had exactly that hole and
      // was re-run after this fix)
      .config("spark.sql.adaptive.enabled",
        sys.props.getOrElse("spark.sql.adaptive.enabled", "true"))
      // same fork-free local checkpoint manager the bench session uses
      // (HarnessSession) — the differential must validate the exact
      // streaming checkpoint path the bench times; overridable the same
      // way for sweeps against the stock manager
      .config("spark.sql.streaming.checkpointFileManagerClass",
        sys.props.getOrElse("spark.sql.streaming.checkpointFileManagerClass",
          sys.env.getOrElse("SPARK_GRAFT_CKPT_FM",
            "org.apache.spark.sql.GraftCheckpointFileManager")))
      .config("spark.ui.enabled", "false")
    if (master.startsWith("local-cluster")) {
      // Executor JVMs are forked by the in-process Worker from SPARK_HOME's
      // launcher; they get SPARK_HOME/jars but NOT this sbt build's classes
      // dir — without extraClassPath every graft class hits CNFE on the
      // first task. The JVM default timezone is NOT propagated to forked
      // executors (only SQL confs are), so pin -Duser.timezone=UTC there.
      val classesDir = new java.io.File("target/scala-2.13/classes")
        .getAbsolutePath
      builder
        .config("spark.executor.extraClassPath", classesDir)
        .config("spark.executor.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.executor.memory",
          sys.env.getOrElse("SPARK_GRAFT_EXECUTOR_MEM", "3g"))
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // echo the effective hostile-mode switches so a sweep's artifact
    // proves which mode actually ran (not just which flags were passed)
    System.err.println("[verify] effective modes: adaptive=" +
      spark.conf.get("spark.sql.adaptive.enabled") +
      " wholeStageCodegen=" + spark.conf.get("spark.sql.codegen.wholeStage") +
      " ansi=" + spark.conf.get("spark.sql.ansi.enabled") +
      " objectHashAgg=" +
      spark.conf.get("spark.sql.execution.useObjectHashAggregateExec") +
      " vecParquet=" +
      spark.conf.get("spark.sql.parquet.enableVectorizedReader") +
      " shufflePartitions=" +
      spark.conf.get("spark.sql.shuffle.partitions") +
      " memoryFraction=" + spark.conf.get("spark.memory.fraction", "0.6") +
      " forceSpillThreshold=" +
      spark.conf.get("spark.shuffle.spill.numElementsForceSpillThreshold",
        "none") +
      " maxHeapMb=" +
      (Runtime.getRuntime.maxMemory() / (1024 * 1024)))
    // one materialization of the shared enriched frame for the whole run;
    // never fatal — queries that don't touch it must still verify.
    // NonFatal only: an OOM/linkage error must abort the JVM, not cascade
    // into ~70 misleading per-query failures.
    try queries.CoreQueries.warmShared(spark, sfDir)
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[verify] warmShared failed: ${e.getMessage}")
    }
    // share the co-purchase edge table across the three graph queries
    // (lazy: the first consumer's action pays the one materialization)
    try queries.GraphQueries.warmEdges(spark, sfDir)
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[verify] warmEdges failed: ${e.getMessage}")
    }
    val failures = dumpAll(spark, sfDir, outDir,
      SparkEntry.queries.filter { case (name, _) =>
        pattern.isEmpty || name.contains(pattern) })
    writeJsonMap(s"$outDir/oracle_sql.json", SparkEntry.oracleSql)
    queries.CoreQueries.coolShared(spark)
    queries.GraphQueries.coolEdges(spark)
    queries.ExtensionQueries.coolClusters(spark)
    queries.ExtensionQueries.coolIvf(spark)
    ext.TextAnalysis.coolTokens(spark)
    spark.stop()
    // exit 0 even on failures: the driver's compare step must still run
    // over the partial dump (a non-zero exit here could be read as "no
    // results at all"). The failures are loud in _failures.json and in
    // tools/compare.py, which DOES exit non-zero on any FAIL.
    if (failures.nonEmpty)
      System.err.println(s"[verify] ${failures.size} queries failed: " +
        failures.keys.mkString(", "))
  }
}

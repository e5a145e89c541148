package graft

import org.apache.spark.sql.SparkSession

/** Shared session builder for the bench harnesses (Bench / BenchOne /
  * BenchGrowth), honoring the same SPARK_GRAFT_MASTER override as
  * [[Verify]]: `local-cluster[n,cores,mem]` forks real Worker-launched
  * executor JVMs, putting genuine process-boundary serialization and
  * shuffle wire costs under the TIMED path — the last term of the 100×
  * extrapolation `local[*]` cannot measure (there, broadcast handoff is a
  * same-classloader reference and "shuffle" is an in-heap array move). */
object HarnessSession {
  /** `defaultCpus` is the fallback when SPARK_GRAFT_CPUS is unset — the
    * arbiters default small (4), the growth harness to the full box (32,
    * matching its committed tables). */
  def build(defaultCpus: String = "4"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // overridable default (builder .config beats -D; see Verify)
      .config("spark.sql.adaptive.enabled",
        sys.props.getOrElse("spark.sql.adaptive.enabled", "true"))
      .config("spark.ui.enabled", "false")
    if (master.startsWith("local-cluster")) {
      // forked executors get SPARK_HOME/jars but not this sbt build's
      // classes dir (CNFE otherwise), and the JVM default timezone does
      // not propagate (only SQL confs do) — same provisions as Verify
      val classesDir = new java.io.File("target/scala-2.13/classes")
        .getAbsolutePath
      builder
        .config("spark.executor.extraClassPath", classesDir)
        // ParallelGC on executors for the same reason the driver recipe
        // pins it (SCALE.md bench methodology r10: batch suite, no pause
        // SLO — the throughput collector wins ~7% warm over G1); extra
        // opts ride GRAFT_EXECUTOR_EXTRA_JAVA_OPTS for sweeps.
        .config("spark.executor.extraJavaOptions",
          "-Duser.timezone=UTC -XX:+UseParallelGC " +
            sys.env.getOrElse("GRAFT_EXECUTOR_EXTRA_JAVA_OPTS", ""))
        .config("spark.executor.memory",
          sys.env.getOrElse("SPARK_GRAFT_EXECUTOR_MEM", "3g"))
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

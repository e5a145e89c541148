package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for hot keys (SURVEY §7.4 "salting hook").
  *
  * AQE's skew-join splitting handles most runtime join skew automatically,
  * and map-side partial aggregation already collapses plain count/sum before
  * the shuffle. Salting earns its keep where partials don't reduce: exact
  * distincts, collect_list-style aggregates, or a join whose hot key floods
  * one reducer. Pattern: salt the key, pre-aggregate/join per (key, salt) —
  * the hot key spreads over `salts` reducers — then merge partials. The
  * count/sum forms below are the testable demonstrations of the pattern;
  * averages decompose into sum+count. Salt = partition id mod `salts`:
  * deterministic (reproducible results), no rand() in the plan.
  */
object Skew {

  /** Two-stage salted count: `groupBy(keys).count()` that survives a key
    * owning an arbitrary fraction of the input. */
  def saltedCount(df: DataFrame, keys: Seq[String], salts: Int = 16,
                  as: String = "count"): DataFrame = {
    val keyCols: Seq[Column] = keys.map(col)
    df.withColumn("_salt", pmod(spark_partition_id(), lit(salts)))
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keyCols: _*)
      .agg(sum(col("_partial")).cast("long").as(as))
  }

  /** Two-stage salted sum (double). */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                salts: Int = 16, as: String = "sum"): DataFrame = {
    val keyCols: Seq[Column] = keys.map(col)
    df.withColumn("_salt", pmod(spark_partition_id(), lit(salts)))
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(keyCols: _*)
      .agg(sum(col("_partial")).as(as))
  }

  /** Salted broadcast-join helper for a skewed FACT side joining a dim that
    * is too big to broadcast whole but small per key-range: replicate each
    * dim row `salts` times, salt the fact rows, and join on (key, salt) —
    * every reducer sees 1/salts of the hot key's rows. */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    val saltedFacts = facts.withColumn("_salt",
      pmod(spark_partition_id(), lit(salts)))
    val explodedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFacts.join(explodedDim, Seq(key, "_salt"), "left").drop("_salt")
  }
}

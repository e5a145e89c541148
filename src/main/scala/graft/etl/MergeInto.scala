package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch MERGE INTO (CDC apply): reconcile a base table with a keyed
  * change set carrying upserts, deletes, and inserts — the nightly
  * "apply the day's mutations" shape a warehouse needs once data stops
  * being append-only.
  *
  * Semantics (one change row per key, validated by the caller):
  *   op = 'U' — replace the payload columns of the matching base row
  *   op = 'D' — drop the matching base row
  *   op = 'I' — add a row that has no base match
  *   base rows with no change row pass through unchanged.
  *
  * Scale: ONE full-outer join on the key — both sides shuffle once on
  * the merge key and every disposition is a projection of the joined
  * row. No per-op passes (three anti/semi joins would scan base three
  * times), no driver-side diffing. This is how MERGE compiles in
  * Delta/Iceberg too: full-outer on the match condition + case on the
  * match pattern.
  */
object MergeInto {

  /** Apply `changes` (key, op, payload...) to `base` (key, payload...).
    * Payload columns must match by name; `op` ∈ {U, D, I}. */
  def applyChanges(base: DataFrame, changes: DataFrame, key: String,
      payloadCols: Seq[String]): DataFrame = {
    val b = base.select((key +: payloadCols).map(col): _*)
    val c = changes.select(
      col(key) +: col("op") +: payloadCols.map(n => col(n).as(s"c_$n")): _*)
    def pick(n: String): Column =
      when(col("op") === "U" || col("op") === "I", col(s"c_$n"))
        .otherwise(col(n)).as(n)
    b.join(c, Seq(key), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col(key) +: payloadCols.map(pick): _*)
  }

  /** The inverse of [[applyChanges]]: DERIVE the (I/U/D) changeset
    * between two snapshots of a keyed table. One full-outer join on the
    * key; rows equal on every payload column (null-safe `<=>`) are
    * suppressed as no-ops. Deletes carry null payload (there is no new
    * value to carry). Scale shape is identical to the apply side: one
    * keyed exchange per snapshot — zero for snapshots stored as bucketed
    * tables — no window, no per-column sub-joins; this is the changeset
    * generator that feeds applyChanges-style consumers downstream. */
  def diffSnapshots(oldSnap: DataFrame, newSnap: DataFrame, key: String,
      payloadCols: Seq[String]): DataFrame = {
    val o = oldSnap.select(
      col(key).as("o_key") +: payloadCols.map(n => col(n).as(s"o_$n")): _*)
    val n = newSnap.select(
      col(key).as("n_key") +: payloadCols.map(n => col(n).as(s"n_$n")): _*)
    val unchanged = payloadCols
      .map(c => col(s"o_$c") <=> col(s"n_$c"))
      .reduce(_ && _)
    o.join(n, col("o_key") === col("n_key"), "full_outer")
      .select(
        coalesce(col("n_key"), col("o_key")).as(key) +:
        when(col("o_key").isNull, lit("I"))
          .when(col("n_key").isNull, lit("D"))
          .when(unchanged, lit(null)).otherwise(lit("U")).as("op") +:
        payloadCols.map(c => col(s"n_$c").as(c)): _*)
      .filter(col("op").isNotNull)
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin inclusive vs strict at equal timestamps") {
    val left = Seq((1L, 10L), (1L, 20L)).toDF("k", "t")
    val right = Seq((1L, 10L, "a"), (1L, 15L, "b")).toDF("k", "rt", "v")
    val incl = Joins.asofJoin(left, right, Seq("k"), "t", "rt")
      .orderBy("t").select("t", "rt", "v")
      .as[(Long, Option[Long], Option[String])].collect().toSeq
    assert(incl == Seq((10L, Some(10L), Some("a")),
      (20L, Some(15L), Some("b"))))
    val strict = Joins.asofJoin(left, right, Seq("k"), "t", "rt",
        strict = true)
      .orderBy("t").select("t", "rt", "v")
      .as[(Long, Option[Long], Option[String])].collect().toSeq
    assert(strict == Seq((10L, None, None), (20L, Some(15L), Some("b"))))
  }

  test("asofJoinForward picks the earliest later row; tie semantics mirror") {
    val left = Seq((1L, 10L), (1L, 20L)).toDF("k", "t")
    val right = Seq((1L, 10L, "a"), (1L, 15L, "b")).toDF("k", "rt", "v")
    val incl = Joins.asofJoinForward(left, right, Seq("k"), "t", "rt")
      .orderBy("t").select("t", "rt", "v")
      .as[(Long, Option[Long], Option[String])].collect().toSeq
    // t=10 matches the equal-time row inclusively, t=20 has nothing later
    assert(incl == Seq((10L, Some(10L), Some("a")), (20L, None, None)))
    val strict = Joins.asofJoinForward(left, right, Seq("k"), "t", "rt",
        strict = true)
      .orderBy("t").select("t", "rt", "v")
      .as[(Long, Option[Long], Option[String])].collect().toSeq
    // t=10 must skip the equal-time row and land on the next one
    assert(strict == Seq((10L, Some(15L), Some("b")), (20L, None, None)))
  }

  test("asofJoin leaves unmatched and unmatchable rows null") {
    val left = Seq((1L, 5L), (2L, 50L)).toDF("k", "t")
    val right = Seq((1L, 10L, "late"), (3L, 1L, "other_key"))
      .toDF("k", "rt", "v")
    val out = Joins.asofJoin(left, right, Seq("k"), "t", "rt")
      .orderBy("k").select("k", "v")
      .as[(Long, Option[String])].collect().toSeq
    // k=1: only right row is AFTER t → null; k=2: no right rows at all
    assert(out == Seq((1L, None), (2L, None)))
  }

  test("asofJoin drops null-keyed and null-timed right rows") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq(
      (Option.empty[Long], Option(5L), "null_key"),
      (Option(1L), Option.empty[Long], "null_time"),
      (Option(1L), Option(5L), "good")).toDF("k", "rt", "v")
    val out = Joins.asofJoin(left, right, Seq("k"), "t", "rt")
      .select("v").as[String].collect().toSeq
    assert(out == Seq("good"))
  }

  test("null-timed LEFT rows are unmatchable in both directions") {
    // SQL semantics: t >= NULL / t <= NULL is never true, so a left row
    // with a null time matches nothing. The forward carry is the trap —
    // under default nulls-first ordering the null row's CURRENT..FOLLOWING
    // window would see every right row and swallow the earliest payload.
    val left = Seq((Option(1L), Option(10L)), (Option(1L), Option.empty[Long]))
      .toDF("k", "t")
    val right = Seq((1L, 5L, "early"), (1L, 15L, "late")).toDF("k", "rt", "v")
    val back = Joins.asofJoin(left, right, Seq("k"), "t", "rt")
      .select("t", "v").as[(Option[Long], Option[String])].collect().toSet
    assert(back == Set((Some(10L), Some("early")), (None, None)))
    val fwd = Joins.asofJoinForward(left, right, Seq("k"), "t", "rt")
      .select("t", "v").as[(Option[Long], Option[String])].collect().toSet
    assert(fwd == Set((Some(10L), Some("late")), (None, None)))
  }

  test("asofJoin takes the latest right ROW atomically (nulls included)") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    // latest matching right row has v1 set but v2 null: ASOF semantics
    // (DuckDB, merge_asof) demand (B, null), never a mix with the older row
    val right = Seq(
      (1L, 5L, Some("oldA"), Some("oldB")),
      (1L, 8L, Some("B"), Option.empty[String])).toDF("k", "rt", "v1", "v2")
    val out = Joins.asofJoin(left, right, Seq("k"), "t", "rt")
      .select("rt", "v1", "v2")
      .as[(Option[Long], Option[String], Option[String])].collect().toSeq
    assert(out == Seq((Some(8L), Some("B"), None)))
  }

  test("asofJoin rejects mismatched time types at construction") {
    val left = Seq((1L, "2024-01-10")).toDF("k", "t")
      .select($"k", $"t".cast("date").as("t"))
    val right = Seq((1L, "2024-01-05", "v")).toDF("k", "rt", "v")
    // a silent coercion would either throw per-row (ANSI) or turn bad
    // values into nulls-first rows that leak payload — fail loudly instead
    val e = intercept[IllegalArgumentException] {
      Joins.asofJoin(left, right, Seq("k"), "t", "rt")
    }
    assert(e.getMessage.contains("cast explicitly"))
  }

  test("asofJoin plans a single hash exchange on the key") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, "a")).toDF("k", "rt", "v")
    val p = Joins.asofJoin(left, right, Seq("k"), "t", "rt")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$p")
  }

  test("rangeJoinBucketed matches exact containment across bucket edges") {
    // width 10: intervals straddle bucket boundaries; points sit exactly
    // on lo, hi, boundary multiples, and just outside
    val points = Seq(0L, 9L, 10L, 15L, 20L, 21L, 100L).toDF("p")
    val intervals = Seq((5L, 20L, "i1"), (10L, 10L, "i2"), (90L, 99L, "i3"))
      .toDF("lo", "hi", "iv")
    val got = Joins.rangeJoinBucketed(points, intervals, "p", "lo", "hi",
        bucketWidth = 10)
      .select("p", "iv").as[(Long, String)].collect().toSet
    val want = (for {
      p <- Seq(0L, 9L, 10L, 15L, 20L, 21L, 100L)
      (lo, hi, iv) <- Seq((5L, 20L, "i1"), (10L, 10L, "i2"), (90L, 99L, "i3"))
      if p >= lo && p <= hi
    } yield (p, iv)).toSet
    assert(got == want)
    // and no duplicates: each (point, interval) pair appears exactly once
    val n = Joins.rangeJoinBucketed(points, intervals, "p", "lo", "hi", 10)
      .count()
    assert(n == want.size)
  }

  test("rangeJoinBucketed drops invalid intervals and null points") {
    val points = Seq(Option(5L), Option.empty[Long]).toDF("p")
    val intervals = Seq((1L, 10L, "ok"), (10L, 1L, "inverted"))
      .toDF("lo", "hi", "iv")
    val out = Joins.rangeJoinBucketed(points, intervals, "p", "lo", "hi", 4)
      .select("iv").as[String].collect().toSeq
    assert(out == Seq("ok"))
  }

  test("rangeJoinBucketed fail-fasts on a pathological interval span") {
    // an open-ended sentinel would ask sequence() for ~2^61 buckets; the
    // guard must turn that into a clear named error, not an opaque
    // array-size crash or an OOM'd task
    val points = Seq(5L).toDF("p")
    val intervals = Seq((0L, Long.MaxValue, "open")).toDF("lo", "hi", "iv")
    val e = intercept[Exception] {
      Joins.rangeJoinBucketed(points, intervals, "p", "lo", "hi",
        bucketWidth = 4).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        messages(x.getCause))
    assert(messages(e).exists(_.contains("rangeJoinBucketed")),
      s"expected the guard's message, got: $e")
    // a wide-but-allowed span still works when the cap is raised
    val ok = Joins.rangeJoinBucketed(points,
      Seq((0L, 100L, "w")).toDF("lo", "hi", "iv"), "p", "lo", "hi",
      bucketWidth = 1, maxSpanBuckets = 1000)
    assert(ok.count() == 1)
  }
}

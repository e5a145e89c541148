package graft.ext

import scala.math.BigDecimal.RoundingMode

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Independent sequential references for the SIGNATURE layer of the dedup
  * family (round-11 extension of the differential campaign): the candidate
  * and pair stages downstream of MinHash/SimHash have invariant and
  * count-reproducibility specs, but the signature math itself — the
  * md5-window minhash family, the per-bit SimHash vote, and SemDeDup's
  * within-cell drop rule — was pinned only by fixed fixtures and the
  * cross-engine oracle. Each test here recomputes the signatures from the
  * DEFINITION: a per-doc Scala fold over the collected corpus (JDK
  * MessageDigest, explicit bit arithmetic, left-to-right double
  * accumulation), no Spark operators, on randomized corpora with messy
  * casing, whitespace runs, exact duplicates, near-duplicates, and
  * sub-shingle-length docs. Row sets must match exactly — signatures are
  * integers, so there is no tolerance to hide a drifted hash window or a
  * vote-sign off-by-one. */
class SignaturePropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("spark", "query", "join", "filter", "window",
    "stream", "table", "scan", "merge", "sort", "row", "data")

  private def genWord: Gen[String] = for {
    w <- Gen.oneOf(vocab)
    cased <- Gen.oneOf(w, w.toUpperCase, w.capitalize)
    pad <- Gen.oneOf("", " ", "\t")
  } yield cased + pad

  /** Base docs plus exact copies and one-word mutations: duplicates make
    * the pair tests non-vacuous, short docs exercise the length ≥ k
    * shingle guard, empty docs must vanish from every signature table. */
  private def corpus(seedNo: Long, nBase: Int): Seq[(Long, String)] = {
    val gen = for {
      base <- Gen.listOfN(nBase, Gen.frequency(
        1 -> Gen.const(""),
        1 -> Gen.oneOf(vocab), // shorter than one 8-char shingle
        8 -> Gen.chooseNum(4, 24).flatMap(n =>
          Gen.listOfN(n, genWord).map(_.mkString(" ")))))
      dupIdx <- Gen.listOfN(nBase / 3, Gen.chooseNum(0, nBase - 1))
      mutIdx <- Gen.listOfN(nBase / 3, Gen.chooseNum(0, nBase - 1))
      mutWord <- Gen.oneOf(vocab)
    } yield {
      val dups = dupIdx.map(base)
      val muts = mutIdx.map { i =>
        val ws = base(i).split(" ", -1)
        if (ws.isEmpty) mutWord
        else (ws.dropRight(1) :+ mutWord).mkString(" ")
      }
      base ++ dups ++ muts
    }
    gen.pureApply(Gen.Parameters.default, Seed(seedNo))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
  }

  private def norm(text: String): String =
    text.toLowerCase.replaceAll("\\s+", " ").trim

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  test("minhashSignatures matches a per-doc md5-window fold (3 seeds)") {
    (1L to 3L).foreach { seedNo =>
      val docs = corpus(seedNo, 12)
      val got = Dedup.minhashSignatures(docs.toDF("doc_id", "text"))
        .as[(Long, Int, String)].collect().toSet
      // reference: charShingles(k=8, stride=4) → md5 → four disjoint
      // 8-hex windows parsed as unsigned 32-bit ints → per-window min →
      // (b=2, r=2) band signatures "m0:m1" / "m2:m3"
      val want = docs.flatMap { case (id, text) =>
        val n = norm(text)
        if (n.length < 8) Nil
        else {
          val hs = (1 to n.length - 7 by 4)
            .map(i => md5Hex(n.substring(i - 1, i + 7)))
          def m(w: Int): Long = hs
            .map(h => java.lang.Long.parseLong(
              h.substring(w * 8, w * 8 + 8), 16)).min
          Seq((id, 0, s"${m(0)}:${m(1)}"), (id, 1, s"${m(2)}:${m(3)}"))
        }
      }.toSet
      assert(got == want, s"seed $seedNo: ${got.diff(want)} / ${want.diff(got)}")
    }
  }

  /** The reference SimHash: count-weighted ±1 vote per bit of each
    * distinct token's 32-bit hash (first 8 md5 hex chars); bit set iff
    * the vote sum is strictly positive. */
  private def refSimhash(docs: Seq[(Long, String)]): Map[Long, Long] =
    docs.flatMap { case (id, text) =>
      val ts = norm(text).split(" ", -1).toVector.filter(_.nonEmpty)
      if (ts.isEmpty) None
      else {
        val counts = ts.groupBy(identity).map { case (t, g) =>
          (java.lang.Long.parseLong(md5Hex(t).substring(0, 8), 16),
            g.size.toLong)
        }
        val packed = (0 until 32).map { j =>
          val vote = counts.map { case (h, cnt) =>
            if (((h >> j) & 1L) == 1L) cnt else -cnt
          }.sum
          if (vote > 0) 1L << j else 0L
        }.sum
        Some(id -> packed)
      }
    }.toMap

  test("simhash matches a per-doc bit-vote fold (3 seeds)") {
    (1L to 3L).foreach { seedNo =>
      val docs = corpus(seedNo, 12)
      val got = Dedup.simhash(docs.toDF("doc_id", "text"))
        .as[(Long, Long)].collect().toMap
      val want = refSimhash(docs)
      assert(got == want, s"seed $seedNo: got $got want $want")
    }
  }

  test("simhashPairs equals brute-force hamming over reference signatures") {
    var sawPair = false
    (1L to 3L).foreach { seedNo =>
      val docs = corpus(seedNo, 12)
      val got = Dedup.simhashPairs(docs.toDF("doc_id", "text"))
        .as[(Long, Long, Int)].collect().toSet
      Dedup.releaseScratch()
      val sig = refSimhash(docs).toSeq
      val want = (for {
        (a, sa) <- sig; (b, sb) <- sig if a < b
        h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
      } yield (a, b, h)).toSet
      sawPair ||= want.nonEmpty
      assert(got == want, s"seed $seedNo: ${got.diff(want)} / ${want.diff(got)}")
    }
    assert(sawPair, "no seed produced a hamming<=3 pair; corpus too sparse")
  }

  test("semanticDedup drop rule matches a per-cell pair scan (3 seeds)") {
    (1L to 3L).foreach { seedNo =>
      // templates + per-id epsilon: pairwise-distinct vectors with
      // within-template cosine near 1, plus independent random vectors
      // (cosine spread across the tau boundary) and one zero vector
      // (undefined cosine → NULL → never drops anything)
      val gen = for {
        templates <- Gen.listOfN(3,
          Gen.listOfN(8, Gen.chooseNum(-1.0, 1.0).map(_.toFloat)))
        members <- Gen.listOfN(12, Gen.zip(
          Gen.chooseNum(0, 2), Gen.chooseNum(-0.02, 0.02).map(_.toFloat)))
        loose <- Gen.listOfN(8,
          Gen.listOfN(8, Gen.chooseNum(-1.0, 1.0).map(_.toFloat)))
      } yield members.zipWithIndex.map { case ((t, eps), i) =>
        templates(t).toArray.updated(i % 8, templates(t)(i % 8) + eps)
      } ++ loose.map(_.toArray) :+ Array.fill(8)(0.0f)
      val vecs = gen.pureApply(Gen.Parameters.default, Seed(seedNo))
        .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val tau = 0.98
      val index = Ivf.build(vecs.toDF("vec_id", "embedding"), cells = 4,
        seed = 7L)
      val got = Similarity.semanticDedup(index, tau)
        .as[(Long, Int, Boolean)].collect()
        .map { case (id, _, kept) => id -> kept }.toMap
      // reference over the SAME assignments (the quantizer is MLlib's,
      // not under test): b dropped iff some a < b in b's cell has
      // round4(cos(a, b)) >= tau, with the expression's exact
      // left-to-right double accumulation and zero-norm → undefined
      val cells = index.assignments
        .as[(Long, Int, Array[Float])].collect()
      index.release()
      val dropped = (for {
        (aId, ca, av) <- cells; (bId, cb, bv) <- cells
        if ca == cb && aId < bId
        c <- refCosine(av, bv)
        if BigDecimal(c).setScale(4, RoundingMode.HALF_UP).toDouble >= tau
      } yield bId).toSet
      val want = cells.map { case (id, _, _) => id -> !dropped(id) }.toMap
      assert(got == want, s"seed $seedNo: got $got want $want")
      assert(dropped.nonEmpty, s"seed $seedNo: no within-cell near-dup")
    }
  }

  private def refCosine(a: Array[Float], b: Array[Float]): Option[Double] = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) None else Some(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
}

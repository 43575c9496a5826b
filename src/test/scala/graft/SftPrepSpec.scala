package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.commons.codec.digest.DigestUtils
import graft.operators.SftPrep

/** SFT/alignment data prep: example construction with loss masks,
  * no-straddle greedy packing (pointer-doubling vs a plain-Scala
  * sequential reference), preference-pair mining (funnel exactness). */
class SftPrepSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  // ------------------------------------------------------------------
  // formatExamples
  // ------------------------------------------------------------------

  test("formatExamples renders the template with the exact mask span") {
    val docs = Seq(
      (1L, "a b c d e"),          // n=5, p=ceil(5/3)=2
      (2L, "x y"),                // n=2, p=2? -> (2+2)div3=1
      (3L, "only"),               // n=1 -> dropped
      (4L, null.asInstanceOf[String]), // dropped
      (5L, "  ")                  // no tokens -> dropped
    ).toDF("doc_id", "text")
    val out = SftPrep.formatExamples(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet === Set(1L, 2L))
    val r1 = out(1L)
    assert(r1.getString(1) ===
      "<|user|> a b <|assistant|> c d e <|eot|>")
    assert(r1.getLong(2) === 8)  // n_tokens = 5 + 3
    assert(r1.getLong(3) === 2)  // n_prompt_tokens
    assert(r1.getLong(4) === 3)  // n_response_tokens
    assert(r1.getLong(5) === 4)  // mask_start: [user] p p [assistant] -> 4
    assert(r1.getLong(6) === 8)  // mask_end
    val r2 = out(2L)
    assert(r2.getString(1) === "<|user|> x <|assistant|> y <|eot|>")
    assert(r2.getLong(5) === 3 && r2.getLong(6) === 5)
  }

  test("formatExamples round-trips: stripping the template recovers the doc tokens (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.forAll
    val wordGen = Gen.oneOf("alpha", "b", "cc", "the", "zz9")
    val docGen = Gen.choose(2, 30).flatMap(n => Gen.listOfN(n, wordGen))
    val prop = forAll(Gen.listOfN(8, docGen)) { docsToks =>
      val df = docsToks.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val rows = SftPrep.formatExamples(df).collect()
      Prop.all(rows.map { r =>
        val toks = r.getString(1).split(" ").toSeq
        val n = r.getLong(2).toInt
        val p = r.getLong(3).toInt
        val orig = docsToks(r.getLong(0).toInt)
        val maskStart = r.getLong(5).toInt
        Prop(
          toks.length == n &&
          toks.head == SftPrep.UserTag && toks.last == SftPrep.EotTag &&
          toks(p + 1) == SftPrep.AssistantTag &&
          toks.slice(1, p + 1) ++ toks.slice(p + 2, n - 1) == orig &&
          maskStart == p + 2 && r.getLong(6).toInt == n &&
          // the mask span is exactly the response + end tag
          toks.slice(maskStart, n - 1) == orig.drop(p)) :| s"doc=${r.getLong(0)}"
      }: _*)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  // ------------------------------------------------------------------
  // packGreedy
  // ------------------------------------------------------------------

  /** Plain-Scala sequential greedy reference: same draw, same order, same
    * first-fit rule (an overlong example sits alone). */
  private def referencePack(rows: Seq[(Long, Long)], L: Long, buckets: Int)
      : Map[Long, (Int, Long, Long, Long, Boolean)] = {
    rows.map { case (id, len) =>
      val draw = DigestUtils.md5Hex(s"$id:pack").substring(0, 8)
      (id, len, draw, (java.lang.Long.parseLong(draw, 16) % buckets).toInt)
    }.groupBy(_._4).flatMap { case (b, g) =>
      val ordered = g.sortBy(t => (t._3, t._1))
      var bin = 0L; var fill = 0L; var pos = 0L; var started = false
      ordered.zipWithIndex.map { case ((id, len, _, _), i) =>
        if (started && fill + len > L) { bin += 1; fill = 0L; pos = 0L }
        started = true
        val entry = id -> ((b, i + 1L, bin, pos, len > L))
        fill += len; pos += 1
        entry
      }
    }
  }

  private def runPack(rows: Seq[(Long, Long)], L: Long, buckets: Int,
                      maxLocal: Int = 500000) = {
    val df = rows.toDF("doc_id", "len")
    SftPrep.packGreedy(df, "len", L, "doc_id", numBuckets = buckets,
        maxLocalExamples = maxLocal)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("bucket"), r.getAs[Long]("pack_idx"),
          r.getAs[Long]("bin_id"), r.getAs[Long]("pos_in_bin"),
          r.getAs[Boolean]("overlong"))))
      .toMap
  }

  test("packGreedy equals the sequential greedy reference (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.forAll
    val rowsGen = for {
      n <- Gen.choose(1, 40)
      lens <- Gen.listOfN(n, Gen.choose(0L, 40L))
    } yield lens.zipWithIndex.map { case (l, i) => (i.toLong * 7 + 1, l) }
    val cfgGen = Gen.zip(Gen.choose(5L, 50L), Gen.choose(1, 4))
    // BOTH routes against the same sequential reference: the size-gated
    // driver walk (production default) and the pointer-doubling scale
    // path (maxLocalExamples = 0)
    val prop = forAll(rowsGen, cfgGen) { case (rows, (ll, buckets)) =>
      val ref = referencePack(rows, ll, buckets)
      Prop(runPack(rows, ll, buckets) == ref &&
           runPack(rows, ll, buckets, maxLocal = 0) == ref) :|
        s"L=$ll buckets=$buckets n=${rows.length}"
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("packGreedy boundary cases: exact fit, overlong alone, zero-length") {
    // one bucket so the sequential structure is fully visible
    val ref = referencePack(Seq((1L, 3L), (2L, 3L), (3L, 3L)), 9L, 1)
    assert(runPack(Seq((1L, 3L), (2L, 3L), (3L, 3L)), 9L, 1) === ref)
    // every bin in the exact-fit case is the full 9 tokens
    assert(ref.values.map(_._3).toSet.size === 1)

    // an overlong example occupies its own bin and is flagged
    val rows = Seq((1L, 5L), (2L, 99L), (3L, 5L))
    val out = runPack(rows, 10L, 1)
    assert(out === referencePack(rows, 10L, 1))
    val overlongBin = out.collect { case (_, (_, _, bin, _, true)) => bin }
    assert(overlongBin.size === 1)
    assert(out.count { case (_, (_, _, bin, _, _)) =>
      bin == overlongBin.head } === 1)

    // zero-length examples pack without opening bins
    val z = Seq((1L, 0L), (2L, 0L), (3L, 4L))
    assert(runPack(z, 4L, 1) === referencePack(z, 4L, 1))
  }

  test("packGreedy single example and empty input") {
    assert(runPack(Seq((7L, 3L)), 10L, 2) ===
      referencePack(Seq((7L, 3L)), 10L, 2))
    val empty = runPack(Seq.empty[(Long, Long)], 10L, 2)
    assert(empty.isEmpty)
  }

  test("packGreedy is partition-layout independent") {
    val rows = (1L to 60L).map(i => (i, i % 13))
    val df = rows.toDF("doc_id", "len").repartition(7)
    val a = SftPrep.packGreedy(df, "len", 16L, "doc_id", numBuckets = 3)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("bin_id"),
        r.getAs[Long]("pos_in_bin"))).toSet
    val b = referencePack(rows, 16L, 3)
      .map { case (id, (_, _, bin, pos, _)) => (id, bin, pos) }.toSet
    assert(a === b)
  }

  test("packGreedy deep orbit: many bins in one bucket (doubling route)") {
    // 200 examples of len 10 at L=10 -> 200 bins; exercises the doubling
    // well past a handful of rounds (ceil(log2 201) = 8)
    val rows = (1L to 200L).map(i => (i, 10L))
    assert(runPack(rows, 10L, 1, maxLocal = 0) ===
      referencePack(rows, 10L, 1))
  }

  test("packGreedy route boundary: exactly at and one over maxLocalExamples") {
    val rows = (1L to 24L).map(i => (i, (i % 9) + 1))
    val ref = referencePack(rows, 12L, 2)
    // exactly at the gate -> local walk; one under -> doubling
    assert(runPack(rows, 12L, 2, maxLocal = 24) === ref)
    assert(runPack(rows, 12L, 2, maxLocal = 23) === ref)
  }

  // ------------------------------------------------------------------
  // preferencePairs
  // ------------------------------------------------------------------

  private val prefDocs = Seq(
    // stratum a: scores 1..6 over ids 1..6
    ("a", 1L, 0.1), ("a", 2L, 0.2), ("a", 3L, 0.3),
    ("a", 4L, 0.9), ("a", 5L, 0.8), ("a", 6L, 0.7),
    // stratum b: 3 docs -> floor(3/2) = 1 pair max
    ("b", 7L, 0.0), ("b", 8L, 0.5), ("b", 9L, 1.0),
    // stratum c: margin too small
    ("c", 10L, 0.4), ("c", 11L, 0.45)
  ).toDF("src", "id", "score")

  test("preferencePairs pairs rank-i best with rank-i worst, margin-gated") {
    val out = SftPrep.preferencePairs(prefDocs, "src", "score", "id",
        k = 3, minMargin = 0.3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // a: (4 best,1 worst), (5,2), (6,3) all with margin >= 0.3
    // b: (9,7) only (rank 2 would exceed floor(3/2))
    // c: margin 0.05 < 0.3 -> nothing
    assert(out === Set(
      ("a", 1L, 4L, 1L), ("a", 2L, 5L, 2L), ("a", 3L, 6L, 3L),
      ("b", 1L, 9L, 7L)))
  }

  test("preferencePairs: chosen and rejected sets never overlap") {
    val out = SftPrep.preferencePairs(prefDocs, "src", "score", "id",
      k = 10, minMargin = 0.0).collect()
    val chosen = out.map(_.getLong(2)).toSet
    val rejected = out.map(_.getLong(3)).toSet
    assert(chosen.intersect(rejected).isEmpty)
  }

  test("preferencePairs two-phase funnel equals the single-window form (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.forAll
    val docGen = for {
      n <- Gen.choose(1, 50)
      rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf("s1", "s2", "s3"),
        Gen.choose(0, 10)))
    } yield rows.zipWithIndex.map { case ((s, sc), i) =>
      (s, i.toLong, sc / 10.0)
    }
    val prop = forAll(docGen, Gen.choose(1, 6)) { (rows, k) =>
      val df = rows.toDF("src", "id", "score")
      def run(sub: Int) = SftPrep.preferencePairs(df, "src", "score", "id",
          k = k, minMargin = 0.2, subPartitions = sub)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(6)))
        .toSet
      Prop(run(1) == run(4)) :| s"k=$k n=${rows.length}"
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}

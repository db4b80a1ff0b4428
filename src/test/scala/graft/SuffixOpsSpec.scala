package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Prefix-doubling suffix array: ranks must equal a brute-force sort of
  * every suffix string (the formulation the operator exists to avoid
  * materializing). */
class SuffixOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ranksOf(docs: Seq[(Long, String)], maxLen: Int = 192)
    : Map[(Long, Int), Long] =
    graft.ops.SuffixOps.suffixRanks(docs.toDF("doc_id", "text"), maxLen)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
      .toMap

  /** Brute-force oracle: dense 0-based rank by suffix string. */
  private def brute(docs: Seq[(Long, String)], maxLen: Int = 192)
    : Map[(Long, Int), Long] = {
    val sfx = for {
      (id, t0) <- docs
      t = t0.take(maxLen)
      p <- 0 until t.length
    } yield ((id, p), t.substring(p))
    val rank = sfx.map(_._2).distinct.sorted.zipWithIndex.toMap
    sfx.map { case (k, s) => k -> rank(s).toLong }.toMap
  }

  test("banana: the textbook suffix array") {
    val got = ranksOf(Seq((7L, "banana")))
    // suffixes sorted: a, ana, anana, banana, na, nana
    assert(got === Map((7L, 5) -> 0L, (7L, 3) -> 1L, (7L, 1) -> 2L,
      (7L, 0) -> 3L, (7L, 4) -> 4L, (7L, 2) -> 5L))
  }

  test("cross-doc ties share ranks; prefix sorts before its extension") {
    val got = ranksOf(Seq((1L, "abab"), (2L, "abab"), (3L, "abc")))
    // identical docs → identical rank sequences (the dedup signal)
    (0 until 4).foreach(p => assert(got((1L, p)) === got((2L, p))))
    // "ab" (doc1 pos2) < "abab" (doc1 pos0) < "abc" (doc3 pos0)
    assert(got((1L, 2)) < got((1L, 0)))
    assert(got((1L, 0)) < got((3L, 0)))
    assert(got === brute(Seq((1L, "abab"), (2L, "abab"), (3L, "abc"))))
  }

  test("matches the brute-force suffix sort on a mixed corpus") {
    // deterministic pseudo-texts long enough to need several doubling
    // rounds, with planted shared substrings across docs
    val docs = (0L until 40L).map { i =>
      val base = s"the quick ${("abc" * ((i % 5) + 1).toInt)} fox " +
        s"jumps over ${(i % 7)} lazy dogs " + ("na" * ((i % 9) + 1).toInt)
      (i, base + (if (i % 3 == 0) " shared suffix tail" else ""))
    }
    assert(ranksOf(docs) === brute(docs))
  }

  test("maxLen truncates before ranking and bounds the round count") {
    val docs = Seq((1L, "aaaaabbbbbcccccddddd"), (2L, "aaaaabbbbbzzz"))
    assert(ranksOf(docs, maxLen = 8) === brute(docs, maxLen = 8))
  }

  test("pairwise fallback (the n ≥ 2^31 path) ranks identically") {
    val docs = (0L until 25L).map(i =>
      (i, s"prefix ${"ab" * (i % 6 + 1).toInt} mid ${i % 4} tail"))
    val packed = graft.ops.SuffixOps
      .suffixRanks(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val pairwise = graft.ops.SuffixOps
      .suffixRanks(docs.toDF("doc_id", "text"), forcePairwise = true)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(packed === pairwise)
    assert(packed === brute(docs))
  }

  /** Brute-force LCP census: sort distinct suffixes, pair adjacent,
    * common-prefix length capped at `window`. */
  private def bruteLcp(docs: Seq[(Long, String)], maxLen: Int,
                       window: Int): Map[Long, (Long, Long)] = {
    val distinct = docs.flatMap { case (_, t0) =>
      val t = t0.take(maxLen); (0 until t.length).map(t.substring)
    }.distinct.sorted
    distinct.sliding(2).zipWithIndex.collect {
      case (Seq(a, b), r) =>
        val wa = a.take(window); val wb = b.take(window)
        val lcp = wa.zip(wb).takeWhile { case (x, y) => x == y }.size.toLong
        (lcp, r.toLong)
    }.toSeq.groupBy(_._1)
      .map { case (l, xs) => l -> (xs.size.toLong, xs.map(_._2).sum) }
  }

  test("lcp census matches the brute-force adjacent-suffix scan, " +
      "window caps long repeats, planted verbatim repeat is visible") {
    // doc 2 repeats doc 1's 30-char phrase verbatim → some adjacent pair
    // must share ≥ 30 chars; the window cap (16) truncates it to 16
    val phrase = "the exact thirty char phrase x"
    val docs = Seq(
      (1L, s"alpha $phrase beta ${"na" * 5}"),
      (2L, s"gamma $phrase delta"),
      (3L, "unrelated content entirely zz"))
    val got = graft.ops.SuffixOps
      .lcpCensus(docs.toDF("doc_id", "text"), maxLen = 96, window = 16)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got === bruteLcp(docs, maxLen = 96, window = 16))
    // the planted repeat saturates the window: an LCP = 16 pair exists
    assert(got.contains(16L))
  }

  test("lcp census is partition-count invariant") {
    val docs = (0L until 24L).map(i =>
      (i, s"shared header text ${"ab" * (i % 5 + 1).toInt} tail $i"))
    val df = docs.toDF("doc_id", "text")
    val a = graft.ops.SuffixOps.lcpCensus(df, maxLen = 64, window = 24)
      .collect().map(_.toSeq)
    val b = graft.ops.SuffixOps
      .lcpCensus(df.repartition(7), maxLen = 64, window = 24)
      .collect().map(_.toSeq)
    assert(a.nonEmpty && a.toSeq === b.toSeq)
  }

  test("census: shard counts, distincts and checksums are partition-count" +
      " invariant") {
    val docs = (0L until 30L).map(i => (i, ("xy" * (i % 11 + 1).toInt) +
      i.toString))
    val df = docs.toDF("doc_id", "text")
    val a = graft.ops.SuffixOps.suffixCensus(df, maxLen = 64, shardShift = 4)
      .collect().map(_.toSeq)
    val b = graft.ops.SuffixOps
      .suffixCensus(df.repartition(7), maxLen = 64, shardShift = 4)
      .collect().map(_.toSeq)
    assert(a.nonEmpty && a.toSeq === b.toSeq)
  }
}

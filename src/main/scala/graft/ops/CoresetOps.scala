package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy facility-location coreset selection — the submodular
  * subset-selection operator data curation runs to pick a small,
  * maximally-representative training subset (the DataComp/coreset
  * literature's standard objective): choose S, |S| = k, maximizing
  * Σ_j max_{c∈S} sim(j, c) over a coverage set. Greedy is (1−1/e)
  * optimal because facility location is monotone submodular.
  *
  * Everything is INTEGER-exact: embedding elements quantize once via
  * floor(x·1000) (floor, not round — no half-way tie for the engines to
  * break differently), similarities are integer dot products (|q| ≤ 10³,
  * 64 dims → |sim| ≤ 6.4·10⁷, exact in BIGINT and exact in the oracle's
  * float64 dot), so the per-round argmax and the coverage census are
  * bit-deterministic under any partitioning — no float rounding rails
  * anywhere in the loop.
  *
  * Scale shape: the coverage set is a bounded SAMPLE (the standard
  * approximation — the objective over a uniform coverage sample
  * concentrates around the full objective), carried with its running
  * `best` coverage as a broadcast-sized table; each round is one
  * broadcast cross-join + per-candidate sum (gain), a 1-row argmax
  * collect, and one narrow best-update — the 10^12-row candidate scan
  * streams, nothing quadratic materializes. Stochastic-greedy (sampling
  * candidates per round) drops in by filtering the candidate scan.
  */
object CoresetOps {

  /** Select `k` facilities from `emb` (vec_id, embedding: array<float>)
    * with the coverage set `emb` filtered by `coverageMod` (vec_id %
    * coverageMod == 0). Output one row per selection round:
    * (step, vec_id, gain, objective) — `gain` the marginal coverage the
    * pick added, `objective` the total Σ_j best_j after it (the census
    * binding the whole best state each round). */
  def facilityLocation(emb: DataFrame, k: Int = 8,
                       coverageMod: Int = 2): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val q = emb.select(col("vec_id").cast("long").as("id"),
      expr("transform(embedding, x -> " +
        "CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))").as("qe"))
    val cands = q.persist()
    cands.count()
    // coverage sample with its running best, re-persisted per round
    var cover = cands.filter(col("id") % coverageMod === 0)
      .select(col("id").as("j"), col("qe").as("qj"),
        lit(0L).as("best")).persist()

    val picked = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = scala.collection.mutable
      .ArrayBuffer.empty[(Long, Long, Long, Long)]
    val dot = "CAST(aggregate(zip_with(qe, qj, (x, y) -> x * y), " +
      "CAST(0 AS BIGINT), (acc, v) -> acc + v) AS BIGINT)"
    var step = 1
    while (step <= k) {
      val gains = cands
        .filter(!col("id").isInCollection(
          if (picked.isEmpty) Seq(-1L) else picked.toSeq))
        .crossJoin(broadcast(cover))
        .select(col("id"), expr(s"greatest($dot - best, 0L)").as("g"))
        .groupBy(col("id")).agg(sum(col("g")).as("gain"))
        .orderBy(col("gain").desc, col("id"))
        .limit(1).collect()(0)
      val (sel, gain) = (gains.getLong(0), gains.getLong(1))
      picked += sel
      val selVec = cands.filter(col("id") === sel)
        .select(col("qe")).collect()(0).getSeq[Long](0)
      val nextCover = cover
        .withColumn("qs", typedLit(selVec))
        .select(col("j"), col("qj"),
          greatest(col("best"), expr(
            "CAST(aggregate(zip_with(qs, qj, (x, y) -> x * y), " +
              "CAST(0 AS BIGINT), (acc, v) -> acc + v) AS BIGINT)"))
            .as("best")).persist()
      val objective = nextCover.agg(sum(col("best"))).collect()(0).getLong(0)
      cover.unpersist()
      cover = nextCover
      out += ((step.toLong, sel, gain, objective))
      step += 1
    }
    cover.unpersist(); cands.unpersist()
    out.toSeq.toDF("step", "vec_id", "gain", "objective")
      .orderBy(col("step"))
  }
}

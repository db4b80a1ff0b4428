package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark lacks natively (built-ins category (a):
  * composition of repartition + sortWithinPartitions + a mapPartitions
  * sweep). Each left row joins the LATEST right row of the same key with
  * `right.ts <= left.ts` (inclusive), the standard event-attribution /
  * point-in-time-lookup semantics; DuckDB's native ASOF JOIN is the oracle.
  *
  * Scale shape: ONE hash shuffle of both inputs keyed by the join key, an
  * in-partition sort (Tungsten spillable sort, not a per-group array), and
  * a linear sweep carrying one row of state per key — no window function,
  * no per-key materialization, so a key with 10^9 events streams through.
  */
object AsOfJoin {

  /** leftDf/rightDf: (key: bigint, ts: timestamp, id: bigint) — select the
    * payload down to an id on the way in and join it back after (keeps the
    * sweep narrow). Output: (left_id, right_id nullable).
    *
    * `toleranceMicros`: staleness bound (pandas `merge_asof(tolerance=…)` /
    * feature-store point-in-time-lookup semantics) — a match older than the
    * bound is REJECTED, not served stale: the left row emits null exactly as
    * if no right row existed. The sweep carries the matched row's timestamp
    * alongside its id, so the bound costs one comparison, no extra shuffle.
    */
  def join(leftDf: DataFrame, rightDf: DataFrame,
           toleranceMicros: Option[Long] = None): DataFrame = {
    val spark = leftDf.sparkSession
    import spark.implicits._
    val tol = toleranceMicros.getOrElse(Long.MaxValue)
    require(tol >= 0, s"toleranceMicros must be >= 0, got $tol")
    // side 0 = right, 1 = left: right sorts FIRST at equal ts ⇒ inclusive
    def tag(df: DataFrame, side: Int) =
      df.select(col("key").cast("long").as("_1"),
        // cast handles TIMESTAMP_NTZ parquet columns; only ORDER matters
        // for the sweep, so the session-timezone shift is irrelevant
        unix_micros(col("ts").cast("timestamp")).as("_2"),
        lit(side).as("_3"), col("id").cast("long").as("_4"))
        .as[(Long, Long, Int, Long)]
    tag(rightDf, 0).union(tag(leftDf, 1))
      .repartition(col("_1"))
      .sortWithinPartitions(col("_1"), col("_2"), col("_3"), col("_4"))
      .mapPartitions { it =>
        var curKey = Long.MinValue
        var haveKey = false
        var lastRight = Option.empty[Long]
        var lastRightTs = Long.MinValue
        it.flatMap { case (k, ts, side, id) =>
          if (!haveKey || k != curKey) {
            curKey = k; haveKey = true; lastRight = None
            lastRightTs = Long.MinValue
          }
          if (side == 0) {
            lastRight = Some(id); lastRightTs = ts; Iterator.empty
          } else {
            // staleness guard: ts - lastRightTs can overflow only when no
            // right row has been seen (sentinel MinValue) — lastRight is
            // None there, so the subtraction is never evaluated
            val m = lastRight.filter(_ => ts - lastRightTs <= tol)
            Iterator.single((id, m))
          }
        }
      }
      .toDF("left_id", "right_id")
  }
}

/** Range (interval) join — the other join Spark lacks a native operator
  * for: every (left, right) pair with the same key and
  * `right.ts ∈ [left.ts - window, left.ts]`.
  *
  * Scale shape: time is bucketed at `window` granularity; each right row
  * lands in ONE (key, bucket), each left row probes TWO buckets (its own
  * and the previous — the interval spans at most two), so the join is an
  * equi-join on (key, bucket) + an exact range filter. That bounds the
  * shuffle fan-out at 2× and avoids the O(n²) nested-loop plan Spark picks
  * for raw inequality joins.
  */
object RangeJoin {

  /** leftDf/rightDf: (key: bigint, ts: timestamp, id: bigint);
    * windowMicros: interval length. Output: (left_id, right_id). */
  def join(leftDf: DataFrame, rightDf: DataFrame,
           windowMicros: Long): DataFrame = {
    def base(df: DataFrame) =
      df.select(col("key").cast("long").as("key"),
        unix_micros(col("ts").cast("timestamp")).as("tsu"),
        col("id"))
    val right = base(rightDf)
      .withColumn("bucket", floor(col("tsu") / windowMicros))
    val left = base(leftDf)
      .withColumn("bucket", explode(array(
        floor(col("tsu") / windowMicros) - 1,
        floor(col("tsu") / windowMicros))))
    left.as("l").join(right.as("r"),
        col("l.key") === col("r.key") && col("l.bucket") === col("r.bucket") &&
        col("r.tsu") >= col("l.tsu") - windowMicros &&
        col("r.tsu") <= col("l.tsu"))
      .select(col("l.id").as("left_id"), col("r.id").as("right_id"))
  }
}

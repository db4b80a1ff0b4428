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
    * sweep narrow). Output: (left_id, right_id nullable). */
  def join(leftDf: DataFrame, rightDf: DataFrame): DataFrame = {
    val spark = leftDf.sparkSession
    import spark.implicits._
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
        it.flatMap { case (k, _, side, id) =>
          if (!haveKey || k != curKey) {
            curKey = k; haveKey = true; lastRight = None
          }
          if (side == 0) { lastRight = Some(id); Iterator.empty }
          else Iterator.single((id, lastRight))
        }
      }
      .toDF("left_id", "right_id")
  }
}

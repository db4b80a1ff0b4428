package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling (ANALYZE-style column statistics): one pass over the
  * table emitting per-column completeness, exact cardinality, and min/max.
  * Callers pre-normalize non-integer/non-string columns (doubles → cents,
  * timestamps → epoch micros) so the stringified min/max render
  * identically in every engine.
  *
  * Scale notes: the single agg computes every column's stats in one
  * shuffle; the multi-column exact countDistinct plans as an Expand
  * (×cols input amplification) — the deliberate exactness baseline. At
  * 10^12 rows swap `countDistinct` for `approx_count_distinct` (HLL++)
  * and the Expand disappears; the output contract is unchanged.
  */
object ProfileOps {

  /** Equi-depth histogram (ANALYZE's companion stat to [[profile]]):
    * boundaries are the exact q/B-quantiles via the rank-over-distinct-
    * values formulation (the q25 method — cumulative counts over the
    * DISTINCT value domain, never a global row sort), collected as B−1
    * scalars (the IvfOps-style tiny-collect contract), then every row is
    * bucketed by a codegen'd comparison chain and aggregated once.
    * Ties bucket low (bucket = #boundaries strictly below the value), so
    * the histogram is deterministic under duplicates. */
  def equiDepthHistogram(df: DataFrame, valueCol: String,
                         buckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = df.select(col(valueCol).cast("long").as("v"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = v.groupBy(col("v")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(w))
    val n = v.count()
    val spark = df.sparkSession
    import spark.implicits._
    val rks = (1 until buckets)
      .map(q => (q, (q.toLong * n + buckets - 1) / buckets))
      .toDF("q", "rk")
    // all B−1 boundaries in ONE pass over the distinct-value rollup
    val bounds = cum.crossJoin(broadcast(rks))
      .where(col("cum") >= col("rk") && col("cum") - col("c") < col("rk"))
      .select(col("q"), col("v")).collect()
      .sortBy(_.getInt(0)).map(_.getLong(1)).toSeq
    val bucket = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(lit(b) < col("v"), 1).otherwise(0)
    }
    v.select(col("v"), bucket.cast("int").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), min(col("v")).as("min_v"),
        max(col("v")).as("max_v"), sum(col("v")).cast("long").as("sum_v"))
      .orderBy(col("bucket"))
  }

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', ${c}__nn, ${c}__nd, ${c}__min, ${c}__max"
    }.mkString(", ")
    one.select(col("n_rows"), expr(
        s"stack(${cols.size}, $stackArgs) AS " +
          "(column_name, n_nonnull, n_distinct, min_v, max_v)"))
      .select(col("column_name"), col("n_rows"),
        (col("n_rows") - col("n_nonnull")).as("n_null"),
        col("n_distinct"), col("min_v"), col("max_v"))
      .orderBy(col("column_name"))
  }
}

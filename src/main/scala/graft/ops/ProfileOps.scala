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

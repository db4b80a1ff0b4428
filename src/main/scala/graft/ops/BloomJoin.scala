package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** Bloom-filter semi-join reduction (an explicit runtime filter).
  *
  * For a selective inner join `big ⋈ small`, the dominant cost at 100 TB is
  * shuffling the big side: every probe row pays the exchange even though
  * only a sliver of them find a partner. Building a Bloom filter over the
  * build side's keys (one distributed pass; the sketch is an OR-mergeable
  * fixed-size bit array, so the driver receives bits/8 bytes regardless of
  * row count) and broadcasting it lets the probe side drop non-matching
  * rows BEFORE the exchange — shuffle volume falls from O(|big|) to
  * O(matches + fpp·|big|), and the join result is exactly preserved for
  * inner/semi joins because a Bloom filter has no false negatives.
  *
  * Spark's optimizer has an automatic analogue
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`, injected under AQE
  * when column stats clear its thresholds); this operator is the explicit,
  * deterministic version a pipeline can rely on when stats are absent —
  * the usual case right after ingesting raw web data.
  */
object BloomJoin {

  /** Inner join with the probe (`large`) side pre-filtered by a Bloom
    * filter of `small`'s keys. Key column must be integral or string.
    * NOT valid for outer joins (dropped probe rows would lose their
    * null-extended output row).
    *
    * The probe is a codegen'd Catalyst expression (BloomMightContain), not a
    * `udf()` — per-row lambda boxing on the probe side would tax exactly the
    * rows this operator exists to make cheap. `expectedItems` ≤ 0 (default)
    * sizes the sketch from `small.count()` — one agg-only job, trivially
    * cheap next to the build scan, and it keeps the fpp contract honest: a
    * fixed guess that the build side outgrows silently degrades the realized
    * fpp and evaporates the shuffle reduction. */
  def bloomReducedJoin(large: DataFrame, small: DataFrame, key: String,
                       expectedItems: Long = -1L,
                       fpp: Double = 0.01): DataFrame = {
    val n = if (expectedItems > 0) expectedItems else math.max(small.count(), 1L)
    val bf = small.stat.bloomFilter(key, n, fpp)
    large.schema(key).dataType match {
      case LongType | IntegerType | StringType => ()
      case t => throw new IllegalArgumentException(s"unsupported key type $t")
    }
    import org.apache.spark.sql.GraftColumnBridge._
    val keep = column(graft.functions.BloomMightContain(expression(col(key)), bf))
    large.filter(keep).join(small, key)
  }
}

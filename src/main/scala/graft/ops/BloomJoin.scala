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
    * null-extended output row). */
  def bloomReducedJoin(large: DataFrame, small: DataFrame, key: String,
                       expectedItems: Long = 1000000L,
                       fpp: Double = 0.01): DataFrame = {
    val bf = small.stat.bloomFilter(key, expectedItems, fpp)
    val bc = large.sparkSession.sparkContext.broadcast(bf)
    val keep = large.schema(key).dataType match {
      case LongType | IntegerType =>
        udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
      case StringType =>
        udf((k: String) => k != null && bc.value.mightContainString(k))
      case t =>
        throw new IllegalArgumentException(s"unsupported key type $t")
    }
    large.filter(keep(col(key))).join(small, key)
  }
}

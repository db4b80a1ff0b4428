package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Targeted salting for skewed equi-joins — the manual fallback when AQE's
  * skew-join splitting can't fire (e.g. the skew is on the BUILD side of a
  * shuffle join, or the join feeds an aggregation that pins partitioning).
  *
  * Mechanics: probe-side rows whose key is in `heavyKeys` get a salt in
  * [0, salts) derived from a caller-supplied row-distinct column (so the
  * heavy key's rows spread over `salts` reducers); build-side rows with a
  * heavy key are replicated once per salt. Non-heavy keys keep salt 0 — no
  * replication, no extra shuffle volume. Result is row-identical to the
  * plain join (spec-asserted).
  *
  * Scale shape: replication cost = |build rows with heavy keys| × salts,
  * chosen ≪ probe size; the heavy reducer that would have absorbed p% of
  * the table now absorbs p/salts. `heavyKeys` comes from a cheap
  * heavy-hitter pass (CorpusOps.countMinSketch or a sampled groupBy) — it
  * is a small driver-side list, broadcast inside the `isin` literal.
  */
object SkewJoin {

  /** @param saltSource a probe-side column with per-row variation (an id,
    *                   an offset — anything; only its hash is used). */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 saltSource: Column, heavyKeys: Seq[Any],
                 salts: Int = 8): DataFrame = {
    val heavy = col(key).isin(heavyKeys: _*)
    val probeSalted = probe.withColumn("__salt",
      when(heavy, pmod(xxhash64(saltSource), lit(salts)).cast("int"))
        .otherwise(lit(0)))
    val buildSalted = build.withColumn("__salt",
      explode(when(heavy, sequence(lit(0), lit(salts - 1)))
        .otherwise(array(lit(0)))))
    probeSalted.join(buildSalted, Seq(key, "__salt")).drop("__salt")
  }
}

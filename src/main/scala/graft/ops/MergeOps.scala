package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE INTO emulation (the Iceberg/Delta upsert the incremental
  * re-extraction job needs: yesterday's snapshot + today's delta → new
  * snapshot). Semantics: delta rows matched on `key` replace snapshot rows
  * (whole-row), unmatched delta rows insert, and delta rows flagged in
  * `deleteCol` remove the key entirely.
  *
  * Plan: ONE full-outer shuffle join keyed by `key`. At 10^12 rows both
  * sides live bucketed on the key (TableIO.writeBucketed emulating Iceberg
  * `bucket(N, doc_id)`), which elides the shuffle on both sides — the merge
  * is then a narrow zip of co-located buckets, the property that makes
  * daily incremental maintenance of a 100 TB table affordable.
  */
object MergeOps {

  /** @param deleteCol boolean column on `delta` marking deletions; rows
    *                  where it is true erase the key from the output (the
    *                  column itself is not carried into the result).
    * @param requireUniqueDeltaKeys delta keys must be unique — a duplicate
    *                  key would fan out through the full-outer join, emitting
    *                  one output row per duplicate and silently corrupting
    *                  the snapshot. Real MERGE INTO raises on multiple
    *                  matches; so does this (default): one keys-only agg job
    *                  over the delta — the small side by construction —
    *                  before the merge plan executes. Disable only when the
    *                  producer already guarantees uniqueness. */
  def upsert(snapshot: DataFrame, delta: DataFrame, key: String,
             deleteCol: Option[String] = None,
             requireUniqueDeltaKeys: Boolean = true): DataFrame = {
    val dataCols = snapshot.columns.filter(_ != key)
    require((dataCols :+ key).forall(delta.columns.contains),
      s"delta must carry the snapshot schema; missing " +
        (dataCols :+ key).filterNot(delta.columns.contains).mkString(","))
    if (requireUniqueDeltaKeys) {
      val dup = delta.groupBy(col(key)).agg(count(lit(1)).as("n"))
        .where(col("n") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"MERGE delta has duplicate keys (e.g. $key=${dup.head.get(0)} × " +
          s"${dup.head.getLong(1)}) — dedup the delta or pass " +
          "requireUniqueDeltaKeys=false")
    }
    val del = deleteCol.map(c => coalesce(col(s"d.$c"), lit(false)))
      .getOrElse(lit(false))
    snapshot.as("s")
      .join(delta.as("d"), col(s"s.$key") === col(s"d.$key"), "full_outer")
      .where(!del) // delete wins over update/keep
      .select(
        coalesce(col(s"d.$key"), col(s"s.$key")).as(key) +:
        dataCols.map { c =>
          // matched or inserted → delta value; unmatched snapshot → keep.
          // whole-row replace: a matched row takes EVERY column from delta
          // (null included), so the choice is keyed on the delta key's
          // presence, not coalesce per column.
          when(col(s"d.$key").isNotNull, col(s"d.$c"))
            .otherwise(col(s"s.$c")).as(c)
        }: _*)
  }
}

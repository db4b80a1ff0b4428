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
    *                  column itself is not carried into the result). */
  def upsert(snapshot: DataFrame, delta: DataFrame, key: String,
             deleteCol: Option[String] = None): DataFrame = {
    val dataCols = snapshot.columns.filter(_ != key)
    require((dataCols :+ key).forall(delta.columns.contains),
      s"delta must carry the snapshot schema; missing " +
        (dataCols :+ key).filterNot(delta.columns.contains).mkString(","))
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

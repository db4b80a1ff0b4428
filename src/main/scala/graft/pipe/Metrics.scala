package graft.pipe

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Free metrics on the write path via `Dataset.observe`: the metric
  * aggregates ride the SAME job that materializes the sink, accumulated
  * task-side like SQL metrics — no second scan of the results. At 10^12
  * docs a separate metrics-table aggregation costs another full pass over
  * the output; this costs nothing beyond the write. The returned map is
  * what a production pipeline appends to the Iceberg metrics table next
  * to CheckpointRunner's per-partition lineage rows. */
object Metrics {

  def observedWrite(df: DataFrame, path: String,
                    metrics: Seq[Column]): Map[String, Any] = {
    require(metrics.nonEmpty, "at least one metric aggregate required")
    val obs = Observation()
    df.observe(obs, metrics.head, metrics.tail: _*)
      .write.mode("overwrite").parquet(path)
    obs.get
  }
}

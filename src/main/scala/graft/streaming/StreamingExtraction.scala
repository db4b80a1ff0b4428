package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.kernel.Backends
import graft.model.{Doc, DocResult}
import graft.pipe.ExtractionPipeline

/** Structured Streaming surface (readStream → transforms → writeStream).
  *
  * The extraction pipeline is per-document stateless, so the same kernel
  * functions run unchanged on a streaming Dataset[Doc] — micro-batches are
  * the streaming analogue of the reference's Celery queue (app/tasks.py):
  * arrival-ordered work units, per-worker model reuse, progress via the
  * streaming query listener instead of Redis task states.
  */
object StreamingExtraction {

  /** Streaming extraction: same map/mapPartitions chain as the batch path.
    * Works on any streaming Dataset[Doc] (file source, Kafka-decoded,
    * MemoryStream in tests). */
  def extract(docs: Dataset[Doc], useDonut: Boolean = false,
              backendName: String = "deterministic"): Dataset[DocResult] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      val backend = Backends.ocr(backendName)
      val donut = () => Backends.donut(backendName)
      it.map { d =>
        ExtractionPipeline.extractDoc(
          ExtractionPipeline.ocrDoc(d, backend), useDonut, donut)
      }
    }
  }

  /** Event-time windowed extraction metrics with a watermark: doc counts
    * and validity by document_type per processing window. `ts` must be an
    * event-time column on the input. */
  def windowedMetrics(results: DataFrame, tsCol: String = "ts",
                      watermark: String = "10 minutes",
                      windowLen: String = "5 minutes"): DataFrame =
    results
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("document_type"))
      .agg(count(lit(1)).as("doc_count"),
        sum(when(col("is_valid"), 1L).otherwise(0L)).as("valid_count"))

  /** Event-time SESSION windows over the metrics stream — the streaming
    * analogue of the batch sessionize (q24): rows for the same key within
    * `gap` of each other merge into one dynamic-length session;
    * `session_window` keeps state only for OPEN sessions and the watermark
    * finalizes + evicts them, so state is bounded by concurrently-active
    * keys, not history. Append mode emits each session exactly once, when
    * the watermark passes its close — the right contract for downstream
    * sinks that must never see a session twice. */
  def sessionMetrics(events: DataFrame, tsCol: String = "ts",
                     keyCol: String = "user_id",
                     watermark: String = "10 minutes",
                     gap: String = "5 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Watermark-BOUNDED streaming dedup (`dropDuplicatesWithinWatermark`) —
    * the production counterpart of [[dedupStream]]: dedup state for a key
    * is evicted once the watermark passes its event time + delay, so state
    * is bounded by arrival rate × window instead of growing with every
    * distinct key ever seen. The contract is correspondingly weaker — a
    * duplicate arriving after its original's state expired is re-emitted
    * (spec-pinned) — which is the right trade for re-crawl dedup, where
    * duplicates cluster in time and exact history lives in the batch
    * layer (p01/p26). */
  def dedupWithinWatermark(docs: DataFrame, tsCol: String = "ts",
                           keyCols: Seq[String] = Seq("content_hash"),
                           delay: String = "10 minutes"): DataFrame =
    docs.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming benchmark decontamination — the continuous-ingestion form
    * of `CorpusOps.decontaminate`: the static eval set's gram hashes (MBs
    * against an unbounded stream) are collected once at query build and
    * broadcast; each arriving doc counts its distinct w-gram hashes
    * against the broadcast set inside the map stage. Per-doc stateless:
    * zero shuffles, no state store, no watermark needed — the right shape
    * for a filter that every ingested document must pass exactly once.
    * Emits (doc_id, n_hit_grams) for contaminated docs only. */
  def decontaminateStream(docs: Dataset[(Long, String)],
                          benchmark: DataFrame,
                          w: Int = 13): Dataset[(Long, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val benchSet: Set[Long] = benchmark
      .select(col("text")).as[String]
      .flatMap(t => graft.ops.DedupOps.gramHashes(t, w))
      .distinct().collect().toSet
    val bc = spark.sparkContext.broadcast(benchSet)
    docs.map { case (id, text) =>
      val set = bc.value
      var n = 0L
      graft.ops.DedupOps.gramHashes(text, w)
        .foreach(h => if (set.contains(h)) n += 1)
      (id, n)
    }.filter(_._2 > 0L)
  }

  /** Streaming NEAR-dup detection vs a static corpus — continuous-ingestion
    * LSH: the corpus is indexed once at query build (minhash band key →
    * doc ids, plus per-doc gram-hash sets for the exact-Jaccard verify) and
    * broadcast; each arriving doc computes its own band keys in the map
    * stage, probes the index for candidates, and verifies them exactly —
    * per-doc stateless, zero stream-side shuffles, no state store. Emits
    * (doc_id, corpus_doc_id, n_inter, n_union) per verified near-dup.
    *
    * Contract: the band index must fit executor memory (24 B/band/doc —
    * hundreds of millions of corpus docs per executor-GB). Past that, the
    * same band keys become a stream-static equi-join on (band_id,
    * band_key) against the parquet-backed `minhashBands` table — identical
    * semantics, one stream-side shuffle per micro-batch. */
  def nearDupStream(docs: Dataset[(Long, String)], staticCorpus: DataFrame,
                    w: Int = 3, bands: Int = 32, rowsPerBand: Int = 3,
                    minJaccardPct: Int = 60): Dataset[(Long, Long, Int, Int)] = {
    import graft.ops.DedupOps
    val spark = docs.sparkSession
    import spark.implicits._
    val corpus = staticCorpus
      .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .collect()
    val index = new java.util.HashMap[Long, java.util.ArrayList[Long]]()
    corpus.foreach { case (id, text) =>
      DedupOps.bandKeysFor(text, w, bands, rowsPerBand).foreach { k =>
        index.computeIfAbsent(k, _ => new java.util.ArrayList[Long]()).add(id)
      }
    }
    val sets: Map[Long, Array[Long]] = corpus.map { case (id, text) =>
      id -> DedupOps.gramHashes(text, w).sorted
    }.toMap
    val bcIndex = spark.sparkContext.broadcast(index)
    val bcSets = spark.sparkContext.broadcast(sets)
    docs.flatMap { case (id, text) =>
      val idx = bcIndex.value
      val cands = scala.collection.mutable.SortedSet[Long]()
      DedupOps.bandKeysFor(text, w, bands, rowsPerBand).foreach { k =>
        val hit = idx.get(k)
        if (hit != null) hit.forEach(c => cands += c)
      }
      val mine = DedupOps.gramHashes(text, w).toSet
      cands.iterator.flatMap { c =>
        val other = bcSets.value(c)
        var inter = 0
        other.foreach(h => if (mine.contains(h)) inter += 1)
        val union = mine.size + other.length - inter
        if (inter * 100 >= union * minJaccardPct) Some((id, c, inter, union))
        else None
      }.toSeq
    }
  }

  /** Streaming exact dedup via custom state
    * (`KeyValueGroupedDataset.flatMapGroupsWithState`): keyed by content
    * hash, the state is one boolean per key — the first arrival of a hash
    * passes through, every later duplicate (within or across micro-batches)
    * is dropped. At 10^12 docs the state store shards by the same hash key
    * the batch dedup groups on, so memory per task is bounded by distinct
    * keys per shard; [[dedupStreamTtl]] bounds it further to a sliding
    * event-time horizon for re-crawl dedup that only needs recent
    * history. */
  def dedupStream(docs: Dataset[(Long, String)]): Dataset[(Long, String)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .groupByKey { case (_, text) => graft.ops.Corpus64.md5Low64(text) }
      .flatMapGroupsWithState[Boolean, (Long, String)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[(Long, String)], state: GroupState[Boolean]) =>
          if (state.exists) {
            Iterator.empty // hash already seen in an earlier batch
          } else {
            state.update(true)
            // keeper = min doc_id within this batch for the key (matches
            // the batch dedup's min-keeper rule)
            rows.toSeq.sortBy(_._1).headOption.iterator
          }
      }
  }

  /** [[dedupStream]] with a BOUNDED state horizon — the 10^12-doc form.
    * Keyed state carries an event-time timeout at last_seen + ttl: while
    * a content hash keeps re-arriving the horizon slides forward and
    * duplicates stay suppressed; once the watermark passes the horizon
    * the key evicts, and a later re-arrival passes through again — the
    * re-crawl contract, where dup suppression only needs recent history
    * and state per shard is bounded by the keys seen within the TTL
    * window, never by corpus history. Rows older than the watermark are
    * dropped by the engine before the stateful operator, so the timeout
    * timestamp is always ahead of the watermark. */
  def dedupStreamTtl(docs: Dataset[(Long, String, java.sql.Timestamp)],
                     watermarkDelay: String = "10 minutes",
                     ttlMs: Long = 30L * 60 * 1000)
      : Dataset[(Long, String)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    docs.withWatermark("_3", watermarkDelay)
      .groupByKey { case (_, text, _) => graft.ops.Corpus64.md5Low64(text) }
      .flatMapGroupsWithState[Boolean, (Long, String)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, rows: Iterator[(Long, String, java.sql.Timestamp)],
         state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { // watermark passed last_seen + ttl
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toSeq
            val lastSeen = batch.map(_._3.getTime).max
            val out =
              if (state.exists) Iterator.empty // suppressed duplicate
              else {
                state.update(true)
                batch.sortBy(_._1).headOption
                  .map(r => (r._1, r._2)).iterator // min-keeper rule
              }
            state.setTimeoutTimestamp(lastSeen + ttlMs) // slide the horizon
            out
          }
      }
  }

  /** CDC-style streaming snapshot maintenance — the streaming form of
    * MERGE INTO: each micro-batch of (doc_id, text, seq, is_delete) change
    * rows is collapsed last-write-wins per key (max `seq`; MERGE requires
    * unique delta keys) and applied to the parquet snapshot at
    * `snapshotPath` via `foreachBatch` + `MergeOps.upsert`. The merged
    * result is materialized (eager localCheckpoint) before the overwrite
    * because raw parquet cannot be rewritten while the plan still reads
    * it; on the 10^12-row deployment both concerns disappear into an
    * Iceberg `MERGE INTO` commit per batch (atomic snapshot swap, partial
    * file rewrite instead of full overwrite — the operator shape is
    * identical). */
  def upsertStream(changes: Dataset[(Long, String, Long, Boolean)],
                   snapshotPath: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    changes.toDF("doc_id", "text", "seq", "is_delete")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyUpsertBatch(batch, snapshotPath)
      }
      .start()
  }

  /** One foreachBatch application of a change-set to the snapshot —
    * IDEMPOTENT under batch replay: re-applying an already-merged delta
    * is a no-op (keyed last-write-wins upsert; a replayed update writes
    * the same value, a replayed delete finds no row). foreachBatch's
    * delivery contract is at-least-once — after a failure the SAME batch
    * may be redelivered — so sink idempotence is exactly what upgrades
    * the end-to-end pipeline to exactly-once snapshots. Asserted by
    * StreamingSpec's replay test. */
  def applyUpsertBatch(batch: DataFrame, snapshotPath: String): Unit = {
    val spark = batch.sparkSession
    val delta = batch.groupBy(col("doc_id"))
      .agg(max_by(struct(col("text"), col("is_delete")), col("seq"))
        .as("b"))
      .select(col("doc_id"), col("b.text").as("text"),
        col("b.is_delete").as("is_delete"))
    val snap =
      if (new java.io.File(snapshotPath).exists)
        spark.read.parquet(snapshotPath)
      else delta.select(col("doc_id"), col("text")).limit(0)
    val merged = graft.ops.MergeOps
      .upsert(snap, delta, "doc_id", deleteCol = Some("is_delete"))
      .localCheckpoint(true)
    merged.write.mode("overwrite").parquet(snapshotPath)
    ()
  }

  /** STREAM-STREAM interval join — the streaming analogue of the batch
    * range join (q23): each purchase joins every click by the same user in
    * the hour before it. Both sides carry watermarks and the join
    * condition bounds event-time distance, so Spark derives a state-
    * retention horizon for each side (a click's state is droppable once
    * the purchase watermark passes click_ts + window) — state is bounded
    * by rate × (watermark + window), never by history. Append-mode inner
    * join: a pair is emitted exactly once, whichever side arrives first.
    * With `joinType = "leftOuter"` an unmatched purchase emits a
    * null-click row — but only once the watermark proves no matching
    * click can still arrive (its state is evictable): the semantics that
    * keep outer results exactly-once under out-of-order arrival.
    * Inputs: purchases(p_user, p_ts, p_id), clicks(c_user, c_ts, c_id). */
  def intervalJoinStream(purchases: DataFrame, clicks: DataFrame,
                         windowSeconds: Long = 3600,
                         watermark: String = "2 hours",
                         joinType: String = "inner"): DataFrame = {
    val p = purchases.withWatermark("p_ts", watermark)
    val c = clicks.withWatermark("c_ts", watermark)
    val joined = p.join(c, expr(
      s"""p_user = c_user AND
          c_ts >= p_ts - INTERVAL $windowSeconds SECONDS AND
          c_ts <= p_ts"""), joinType)
    // a semi join drops the right side entirely — each qualifying purchase
    // emits ONCE however many clicks match (the existence probe)
    if (joinType == "leftSemi")
      joined.select(col("p_id"), col("p_user").as("user_id"))
    else joined.select(col("p_id"), col("c_id"),
      coalesce(col("p_user"), col("c_user")).as("user_id"))
  }

  /** Running per-key event count on Spark 4's `transformWithState` — the
    * arbitrary-state API that supersedes `mapGroupsWithState` (typed
    * `ValueState`/`ListState`/`MapState` handles, per-state TTL, timers)
    * and requires the RocksDB state store, the provider a 10^12-key
    * deployment runs anyway (state spills off-heap instead of living in
    * executor memory). The processor keeps one `ValueState[Long]` per
    * key; each micro-batch emits the updated running count. */
  class RunningCountProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long), (Long, Long)] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode,
      TimerValues, TTLConfig, ValueState}
    @transient private var cnt: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cnt = getHandle.getValueState[Long]("cnt",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timerValues: TimerValues): Iterator[(Long, Long)] = {
      val n = (if (cnt.exists()) cnt.get() else 0L) + rows.size
      cnt.update(n)
      Iterator.single((key, n))
    }
  }

  /** `transformWithState` driver for [[RunningCountProcessor]] over
    * (user_id, event_id) rows. */
  def runningCountsTws(events: Dataset[(Long, Long)]): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new RunningCountProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "n_events")
  }
}

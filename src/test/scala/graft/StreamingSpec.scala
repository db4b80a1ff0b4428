package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.io.Synthesizer
import graft.model.Doc
import graft.pipe.{ExtractionPipeline, Sink}
import graft.streaming.StreamingExtraction

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("streaming extraction over MemoryStream matches the batch pipeline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = (0L until 100L).map(n => Synthesizer.genDoc(42L, n))
    val stream = MemoryStream[Doc]
    stream.addData(docs.take(50))

    val q = StreamingExtraction.extract(stream.toDS()).toDF()
      .writeStream.format("memory").queryName("stream_out")
      .outputMode("append").start()
    q.processAllAvailable()
    stream.addData(docs.drop(50)) // second micro-batch
    q.processAllAvailable()
    q.stop()

    val got = spark.table("stream_out")
      .select(col("doc_id"), col("record_json")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val want = docs.map { d =>
      val r = ExtractionPipeline.run(spark.createDataset(Seq(d))).collect()(0)
      r.doc_id -> r.record_json
    }.toMap
    assert(got === want)
  }

  test("windowed metrics with watermark aggregate by event-time window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String, Boolean)]
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    stream.addData(Seq(
      (ts(1), "Aadhaar Card", true), (ts(2), "Aadhaar Card", false),
      (ts(7), "PAN Card", true)))
    val df = stream.toDS().toDF("ts", "document_type", "is_valid")
    val q = StreamingExtraction.windowedMetrics(df)
      .writeStream.format("memory").queryName("win_out")
      .outputMode("update").start()
    q.processAllAvailable()
    val rows = spark.table("win_out").collect()
    assert(rows.length === 2) // two 5-minute windows
    val aad = rows.find(_.getAs[String]("document_type") == "Aadhaar Card").get
    assert(aad.getAs[Long]("doc_count") === 2L)
    assert(aad.getAs[Long]("valid_count") === 1L)

    // batch 2: the watermark is now 10:07 − 10 min = 09:57, so a 09:30
    // straggler must be DROPPED (never aggregated), while a fresh 10:20
    // row opens its window normally — the semantics that bound state at
    // 10^12 events (windows older than the watermark are evictable)
    val late = java.sql.Timestamp.valueOf("2026-01-01 09:30:00")
    stream.addData(Seq((late, "Voter ID", true), (ts(20), "PAN Card", true)))
    q.processAllAvailable()
    q.stop()
    val rows2 = spark.table("win_out").collect()
    assert(!rows2.exists(_.getAs[String]("document_type") == "Voter ID"),
      "late row beyond the watermark leaked into the aggregation")
    assert(rows2.exists { r =>
      r.getAs[String]("document_type") == "PAN Card" &&
        r.getAs[org.apache.spark.sql.Row]("window")
          .getAs[java.sql.Timestamp]("start").toString.contains("10:20")
    }, "fresh 10:20 window missing")
  }

  test("stream-stream interval join pairs each purchase with prior-hour " +
    "clicks, across micro-batches, in either arrival order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pStream = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val cStream = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val out = StreamingExtraction.intervalJoinStream(
      pStream.toDS().toDF("p_user", "p_ts", "p_id"),
      cStream.toDS().toDF("c_user", "c_ts", "c_id"))
    val q = out.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    // batch 1: click before its purchase (click side arrives first)
    cStream.addData(Seq((1L, ts(5), 101L), (2L, ts(6), 102L)))
    pStream.addData(Seq((1L, ts(30), 201L)))
    q.processAllAvailable()
    // batch 2: purchase's click arrives LATER than the purchase; also a
    // same-user click 2h before a purchase (outside the window → no pair)
    pStream.addData(Seq((2L, ts(40), 202L)))
    cStream.addData(Seq((3L, ts(0), 103L)))
    pStream.addData(Seq((3L, java.sql.Timestamp.valueOf(
      "2026-01-01 12:30:00"), 203L)))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("ssj_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((201L, 101L), (202L, 102L)),
      s"got $pairs")
  }

  test("stream-stream LEFT OUTER interval join: an unmatched purchase " +
    "emits its null-click row only after the watermark closes it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pStream = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val cStream = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val ts = (h: Int) => java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:00:00")
    val out = StreamingExtraction.intervalJoinStream(
      pStream.toDS().toDF("p_user", "p_ts", "p_id"),
      cStream.toDS().toDF("c_user", "c_ts", "c_id"),
      joinType = "leftOuter")
    val q = out.writeStream.format("memory").queryName("ssj_outer")
      .outputMode("append").start()
    // a purchase with NO click for its user
    pStream.addData(Seq((7L, ts(10), 701L)))
    cStream.addData(Seq((8L, ts(10), 801L)))
    q.processAllAvailable()
    // not yet closable: the watermark hasn't passed 10:00 + window
    assert(!spark.table("ssj_outer").collect()
      .exists(_.getLong(0) == 701L), "outer row leaked before the horizon")
    // advance BOTH watermarks well past the horizon, then run the extra
    // batch that flushes watermark-closed outer state
    pStream.addData(Seq((9L, ts(20), 901L)))
    cStream.addData(Seq((9L, ts(20), 902L)))
    q.processAllAvailable()
    pStream.addData(Seq((9L, ts(21), 903L)))
    cStream.addData(Seq((9L, ts(21), 904L)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssj_outer").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(rows(701L) === None, s"expected null click for 701: $rows")
    assert(rows(901L) === Some(902L)) // same-ts click joins (c_ts <= p_ts)
  }

  test("transformWithState running count: ValueState persists across " +
    "micro-batches in the RocksDB state store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val st = MemoryStream[(Long, Long)]
      st.addData(Seq((1L, 10L), (1L, 11L), (2L, 20L)))
      val q = StreamingExtraction.runningCountsTws(st.toDS())
        .writeStream.format("memory").queryName("tws_counts")
        .outputMode("update").start()
      q.processAllAvailable()
      st.addData(Seq((1L, 12L), (3L, 30L)))
      q.processAllAvailable()
      q.stop()
      val last = spark.table("tws_counts").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).max }
      assert(last === Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("stream-stream LEFT SEMI interval join: a purchase with matching " +
    "clicks emits exactly once however many match; one with none never " +
    "emits — the existence probe without the fan-out") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pStream = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val cStream = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val out = StreamingExtraction.intervalJoinStream(
      pStream.toDS().toDF("p_user", "p_ts", "p_id"),
      cStream.toDS().toDF("c_user", "c_ts", "c_id"),
      joinType = "leftSemi")
    val q = out.writeStream.format("memory").queryName("ssj_semi")
      .outputMode("append").start()
    // user 1: TWO in-window clicks for one purchase → one output row;
    // user 2: no clicks at all → no row, ever
    cStream.addData(Seq((1L, ts(5), 101L), (1L, ts(10), 102L)))
    pStream.addData(Seq((1L, ts(30), 201L), (2L, ts(30), 202L)))
    q.processAllAvailable()
    // a click arriving in a LATER batch still semi-qualifies its purchase
    pStream.addData(Seq((3L, ts(40), 203L)))
    cStream.addData(Seq((3L, ts(35), 103L)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssj_semi").collect().map(_.getLong(0)).toSeq
    assert(rows.sorted === Seq(201L, 203L), s"got $rows")
  }

  test("stream-stream FULL OUTER interval join: both unmatched sides emit " +
    "null-padded rows once the watermark closes their state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pStream = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val cStream = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val ts = (h: Int) => java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:00:00")
    val out = StreamingExtraction.intervalJoinStream(
      pStream.toDS().toDF("p_user", "p_ts", "p_id"),
      cStream.toDS().toDF("c_user", "c_ts", "c_id"),
      joinType = "fullOuter")
    val q = out.writeStream.format("memory").queryName("ssj_full")
      .outputMode("append").start()
    // a purchase with no click (user 7) AND a click with no purchase
    // (user 8) — full outer must eventually emit BOTH null-padded rows
    pStream.addData(Seq((7L, ts(10), 701L)))
    cStream.addData(Seq((8L, ts(10), 801L)))
    q.processAllAvailable()
    // advance both watermarks past the horizon + a flush batch
    pStream.addData(Seq((9L, ts(20), 901L)))
    cStream.addData(Seq((9L, ts(20), 902L)))
    q.processAllAvailable()
    pStream.addData(Seq((9L, ts(21), 903L)))
    cStream.addData(Seq((9L, ts(21), 904L)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssj_full").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    assert(rows.contains((Some(701L), None)),
      s"purchase-side outer row missing: $rows")
    assert(rows.contains((None, Some(801L))),
      s"click-side outer row missing: $rows")
    assert(rows.contains((Some(901L), Some(902L)))) // matched pair intact
  }

  test("session windows merge events within the gap, close on watermark, " +
    "emit once in append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String)]
    val ts = (h: Int, m: Int) =>
      java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    val q = StreamingExtraction
      .sessionMetrics(stream.toDS().toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    // u1: two events 2 min apart (one session), then one 30 min later
    // (a second session)
    stream.addData(Seq((ts(10, 0), "u1"), (ts(10, 2), "u1"),
      (ts(10, 30), "u1")))
    q.processAllAvailable()
    // the batch's own watermark (10:30 - 10m = 10:20) already closes the
    // FIRST session (ends 10:07); the 10:30 session is still open
    assert(spark.table("sess_out").count() === 1)
    // sentinel event pushes the watermark to 10:50 — the second closes too
    stream.addData(Seq((ts(11, 0), "u2")))
    q.processAllAvailable()
    q.processAllAvailable() // second no-data batch finalizes the emit
    q.stop()
    val got = spark.table("sess_out")
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getLong(3))).toSet
    // session end = last event + gap; u2's session is still open
    assert(got === Set(
      ("u1", ts(10, 0), ts(10, 7), 2L),
      ("u1", ts(10, 30), ts(10, 35), 1L)))
  }

  test("watermark-bounded dedup drops duplicates inside the window and " +
    "re-admits a key after its state expires") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String, Long)]
    val ts = (h: Int, m: Int) =>
      java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    val q = StreamingExtraction
      .dedupWithinWatermark(stream.toDS().toDF("ts", "content_hash", "doc_id"))
      .writeStream.format("memory").queryName("wmdedup_out")
      .outputMode("append").start()
    stream.addData(Seq((ts(10, 0), "h1", 1L), (ts(10, 1), "h1", 2L)))
    q.processAllAvailable() // in-batch duplicate dropped
    stream.addData(Seq((ts(10, 5), "h1", 3L)))
    q.processAllAvailable() // cross-batch duplicate inside the window dropped
    stream.addData(Seq((ts(10, 40), "h2", 4L)))
    q.processAllAvailable() // advances the watermark to 10:30 > 10:00 + 10m
    stream.addData(Seq((ts(10, 35), "h1", 5L)))
    q.processAllAvailable() // h1 state expired — re-admitted
    q.stop()
    val ids = spark.table("wmdedup_out")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 4L, 5L))
  }

  test("streaming dedup drops duplicates within and across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    stream.addData(Seq(3L -> "alpha beta", 1L -> "alpha beta", 2L -> "unique one"))
    val q = StreamingExtraction.dedupStream(stream.toDS())
      .toDF("doc_id", "text")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    q.processAllAvailable()
    // cross-batch duplicate + a fresh doc
    stream.addData(Seq(9L -> "alpha beta", 4L -> "brand new"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_out").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSet
    // min-keeper within batch 1 (doc 1 beats 3), duplicate 9 dropped in batch 2
    assert(got === Set(1L -> "alpha beta", 2L -> "unique one", 4L -> "brand new"))
  }

  test("streaming dedup with event-time TTL: duplicates suppress inside " +
    "the horizon, the key evicts once the watermark passes last_seen + " +
    "ttl, and a later re-arrival passes through again") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    // watermark delay 10 min, ttl 30 min
    val q = StreamingExtraction
      .dedupStreamTtl(stream.toDS(), "10 minutes", 30L * 60 * 1000)
      .toDF("doc_id", "text")
      .writeStream.format("memory").queryName("dedup_ttl_out")
      .outputMode("append").start()
    stream.addData(Seq((1L, "dup text", ts("10:00")))) // first arrival
    q.processAllAvailable()
    // in-horizon duplicate (10:05 < 10:00 + 30min) — suppressed; the
    // horizon slides to 10:35
    stream.addData(Seq((2L, "dup text", ts("10:05"))))
    q.processAllAvailable()
    // advance the watermark past the horizon: 11:00 - 10min = 10:50 > 10:35
    stream.addData(Seq((3L, "other a", ts("11:00"))))
    q.processAllAvailable()
    // timeout processing fires in the batch AFTER the watermark advanced;
    // this batch evicts the key's state
    stream.addData(Seq((4L, "other b", ts("11:01"))))
    q.processAllAvailable()
    // re-arrival after eviction (10:55 is still above the 10:51 watermark)
    stream.addData(Seq((5L, "dup text", ts("10:55"))))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_ttl_out").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(got === Set(1L -> "dup text", 3L -> "other a",
      4L -> "other b", 5L -> "dup text"))
  }

  test("streaming upsert maintains a parquet snapshot across micro-batches " +
    "(last-write-wins in batch, delete wins, insert/update across batches)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = java.nio.file.Files
      .createTempDirectory("graft_upsert").toString + "/snap"
    val stream = MemoryStream[(Long, String, Long, Boolean)]
    // batch 1: inserts, incl. an in-batch duplicate key (seq 2 wins)
    stream.addData(Seq((1L, "one-a", 1L, false), (1L, "one-b", 2L, false),
      (2L, "two", 1L, false), (3L, "three", 1L, false)))
    val q = StreamingExtraction.upsertStream(stream.toDS(), path)
    q.processAllAvailable()
    val after1 = spark.read.parquet(path).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after1 === Map(1L -> "one-b", 2L -> "two", 3L -> "three"))
    // batch 2: update key 2, delete key 3, insert key 4
    stream.addData(Seq((2L, "two-v2", 5L, false), (3L, "", 5L, true),
      (4L, "four", 5L, false)))
    q.processAllAvailable()
    q.stop()
    val after2 = spark.read.parquet(path).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after2 === Map(1L -> "one-b", 2L -> "two-v2", 4L -> "four"))
  }

  test("foreachBatch upsert sink is idempotent under batch replay " +
    "(exactly-once snapshot despite at-least-once delivery)") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft_replay").toString + "/snap"
    val b1 = Seq((1L, "one", 1L, false), (2L, "two", 1L, false),
      (3L, "three", 1L, false)).toDF("doc_id", "text", "seq", "is_delete")
    StreamingExtraction.applyUpsertBatch(b1, path)
    val b2 = Seq((2L, "two-v2", 5L, false), (3L, "", 5L, true),
      (4L, "four", 5L, false)).toDF("doc_id", "text", "seq", "is_delete")
    StreamingExtraction.applyUpsertBatch(b2, path)
    val once = spark.read.parquet(path).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // a failure between the merge and the offset commit redelivers the
    // SAME batch — the snapshot must not change on the second apply
    StreamingExtraction.applyUpsertBatch(b2, path)
    val twice = spark.read.parquet(path).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(once === Map(1L -> "one", 2L -> "two-v2", 4L -> "four"))
    assert(twice === once)
  }

  test("streaming decontamination flags docs against the static benchmark, " +
       "matching the batch operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val benchSpan = "the quick brown fox jumps"
    val bench = Seq((100L, s"eval item with $benchSpan inside"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      1L -> s"leading words $benchSpan trailing words", // hit (batch 1)
      2L -> "nothing shared here at all today",         // clean (batch 1)
      3L -> s"another doc also containing $benchSpan")  // hit (batch 2)
    val stream = MemoryStream[(Long, String)]
    stream.addData(corpus.take(2))
    val q = StreamingExtraction.decontaminateStream(stream.toDS(), bench, w = 5)
      .toDF("doc_id", "n_hit_grams")
      .writeStream.format("memory").queryName("decon_out")
      .outputMode("append").start()
    q.processAllAvailable()
    stream.addData(corpus.drop(2))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("decon_out").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    val batch = graft.ops.CorpusOps.decontaminate(
        corpus.toDF("doc_id", "text"), bench, w = 5).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_hit_grams")).toSet
    assert(got === batch)
    assert(got.map(_._1) === Set(1L, 3L))
  }

  test("streaming near-dup detection flags arrivals against the static " +
       "LSH index with exact-verified jaccard") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = (1 to 40).map(i => s"token$i").mkString(" ")
    val other = (100 to 140).map(i => s"word$i").mkString(" ")
    val corpus = Seq((10L, base), (11L, other)).toDF("doc_id", "text")
    val nearDup = (1 to 40).map(i => if (i == 7) "CHANGED" else s"token$i")
      .mkString(" ")
    val fresh = (200 to 240).map(i => s"new$i").mkString(" ")
    val stream = MemoryStream[(Long, String)]
    stream.addData(Seq(50L -> nearDup))
    val q = StreamingExtraction.nearDupStream(stream.toDS(), corpus)
      .toDF("doc_id", "corpus_doc_id", "n_inter", "n_union")
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    q.processAllAvailable()
    stream.addData(Seq(51L -> fresh, 52L -> base)) // clean + exact dup
    q.processAllAvailable()
    q.stop()
    val got = spark.table("neardup_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    // near-dup: 1 of 40 tokens changed kills 3 of 38 shingles; exact dup:
    // full overlap. The unrelated arrival and corpus doc 11 never pair.
    assert(got === Set((50L, 10L, 35, 41), (52L, 10L, 38, 38)))
  }

  test("stream-static broadcast join enriches micro-batches with a dimension") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("en", 10L), ("fr", 20L)).toDF("lang", "weight")
    val stream = MemoryStream[(Long, String)]
    stream.addData(Seq(1L -> "en", 2L -> "fr", 3L -> "en"))
    // static side broadcast: every micro-batch joins map-side, no
    // stream-side shuffle — the enrichment shape for per-record dimension
    // lookups at 10^12 rows (dim tables stay small)
    val joined = stream.toDS().toDF("doc_id", "lang")
      .join(broadcast(dim), "lang")
      .groupBy(col("weight")).agg(count(lit(1)).as("n"))
    val q = joined.writeStream.format("memory").queryName("enrich_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    stream.addData(Seq(4L -> "fr", 5L -> "de")) // de: no dim row → dropped
    q.processAllAvailable()
    q.stop()
    val got = spark.table("enrich_out").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(10L -> 2L, 20L -> 2L))
  }

  test("partitioned dataset sink routes by (doc_type_dir, is_valid)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val results = ExtractionPipeline.run(Synthesizer.docs(spark, 200, 42L))
    Sink.write(results, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === 200)
    // physical layout: one directory per (type, validity) — the
    // dataset_builder.py routing contract
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("doc_type_dir=")))
    val aadDir = new java.io.File(s"$dir/doc_type_dir=aadhaar_card")
    assert(aadDir.exists())
    assert(aadDir.listFiles().map(_.getName).count(_.startsWith("is_valid=")) === 2)
  }

  test("Trigger.AvailableNow drains what's available then terminates; a " +
    "checkpointed restart processes ONLY rows added since — the batch " +
    "catch-up mode a scheduled 10^12-doc ingest runs instead of 24/7") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files
      .createTempDirectory("graft_availnow").toString
    val ckpt = base + "/ckpt"
    val out = base + "/out"
    val stream = MemoryStream[(Long, String)]
    stream.addData(Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // file sink: the one sink class that supports checkpoint RECOVERY
    // (memory sink refuses a restart from an existing checkpoint)
    def run() = stream.toDS().toDF("id", "v")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    val q1 = run()
    // AvailableNow self-terminates after draining — no stop() needed
    assert(q1.awaitTermination(60000), "query did not self-terminate")
    assert(spark.read.parquet(out).collect().map(_.getLong(0)).sorted
      === Array(1L, 2L, 3L))
    // rows added AFTER the first run; the restart resumes from the
    // checkpointed offset — the sink must grow by exactly these two rows
    // (a re-read of batch 1 would duplicate 1..3)
    stream.addData(Seq((4L, "d"), (5L, "e")))
    val q2 = run()
    assert(q2.awaitTermination(60000), "restart did not self-terminate")
    assert(spark.read.parquet(out).collect().map(_.getLong(0)).sorted
      === Array(1L, 2L, 3L, 4L, 5L))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.{Synthesizer, TableIO}
import graft.pipe.ExtractionPipeline

/** Bucketed-table layout: co-located joins must be shuffle-free —
  * the property that keeps the golden-verification join narrow at scale. */
class TableIOSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("doc_id-bucketed tables join without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS t_results")
    spark.sql("DROP TABLE IF EXISTS t_golden")
    import scala.reflect.io.Directory
    new Directory(new java.io.File("spark-warehouse/t_results")).deleteRecursively()
    new Directory(new java.io.File("spark-warehouse/t_golden")).deleteRecursively()
    val docs = Synthesizer.docs(spark, 300, 42L)
    val results = ExtractionPipeline.run(docs).toDF()
      .select(col("doc_id"), col("document_type"), col("is_valid"))
    // results table + a "golden" copy, both bucketed on doc_id
    TableIO.writeBucketed(results, "t_results", buckets = 8)
    TableIO.writeBucketed(results.withColumnRenamed("is_valid", "golden_valid"),
      "t_golden", buckets = 8)

    // force the sort-merge path (tiny test tables would broadcast, which is
    // the right plan when one side is small — the bucketed layout is for
    // the large-large case, so demonstrate that one)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = TableIO.bucketedJoin(spark, "t_results", "t_golden")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
      assert(joined.count() === 300)

      // verification semantics: zero mismatches between results and golden
      val mismatches = joined
        .where(col("is_valid") =!= col("golden_valid")).count()
      assert(mismatches === 0)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("snapshot expiry: expired version unreadable, orphan dir reclaimed, " +
    "kept versions byte-stable") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_expire").toString + "/t"
    def snap(n: Int) = (0 until n).map(i => (i.toLong, i * 2L)).toDF("id", "v")
    TableIO.commitSnapshot(snap(10), base, 1)
    TableIO.commitSnapshot(snap(20), base, 2)
    TableIO.commitSnapshot(snap(30), base, 3)
    val (nExp, nOrph) = TableIO.expireSnapshots(spark, base, keepLast = 2)
    assert((nExp, nOrph) === (1, 1))
    // expired version fails fast; kept versions read their exact bytes
    intercept[IllegalArgumentException] {
      TableIO.readSnapshot(spark, base, Some(1)).count()
    }
    assert(TableIO.readSnapshot(spark, base, Some(2)).count() === 20)
    assert(TableIO.readSnapshot(spark, base).count() === 30) // latest = v3
    // the orphaned v1 data dir is physically gone
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/v1")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$base/v2")))
    // expiry is idempotent: nothing more to expire at keepLast=2
    assert(TableIO.expireSnapshots(spark, base, keepLast = 2) === ((0, 0)))
  }

  test("corrupt-file ingest: ignoreCorruptFiles skips the garbage object, " +
    "the default read fails loudly") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_corrupt").toString + "/t"
    (0 until 50).map(i => (i.toLong, i * 2L)).toDF("id", "v")
      .write.mode("overwrite").parquet(base)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(
      s"$base/part-corrupt-0000.parquet"), true)
    out.write(("PAR1 garbage " * 100).getBytes("UTF-8"))
    out.close()
    val resilient = spark.read.schema("id BIGINT, v BIGINT")
      .option("ignoreCorruptFiles", "true").parquet(base)
    assert(resilient.count() === 50)
    assert(resilient.agg(sum(col("v"))).head.getLong(0) === (0 until 50).map(_ * 2L).sum)
    // without the flag the same scan must fail loudly, not silently skip
    val strict = spark.read.schema("id BIGINT, v BIGINT").parquet(base)
    intercept[org.apache.spark.SparkException] { strict.count() }
  }

  test("nested schema pruning: a spans.kind census reads ONLY kind from " +
    "the struct — spans.text dominates table bytes at 10^12 docs and must " +
    "never reach the scan for a kind-only query") {
    val dir = java.nio.file.Files.createTempDirectory("graft_nsp").toString
    Synthesizer.docs(spark, 200, 7L).toDF()
      .write.mode("overwrite").parquet(dir)
    // AQE wraps the plan; disable it while the physical plan materializes
    // so FileSourceScanExec is collectible
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (census, scans) = try {
      val df = spark.read.parquet(dir)
        .select(explode(col("spans")).as("sp"))
        .select(col("sp.kind").as("kind"))
        .groupBy(col("kind")).agg(count(lit(1)).as("n"))
      (df, df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      })
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert(scans.nonEmpty)
    val readSchema = scans.head.requiredSchema.catalogString
    assert(readSchema.contains("kind"), readSchema)
    assert(!readSchema.contains("text") && !readSchema.contains("media_ref"),
      s"struct not pruned — scan reads: $readSchema")
    assert(census.count() > 0)
  }

  test("partitioned+clustered layout: dir pruning at plan time, row-group " +
    "skipping from min/max stats at read time") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val n = 40000
    // k is a deterministic pseudo-random key in [0, 1e6) — clustering must
    // create the min/max locality, not the generator
    val df = (0 until n).map { i =>
      (i.toLong, s"type${i % 4}", (i * 2654435761L) % 1000000L)
    }.toDF("id", "event_type", "k")
    // 16 range buckets over (event_type, k): each of the 4 dirs gets ~4
    // files, each covering ~a quarter of the k range
    TableIO.writePartitionedClustered(df, s"$dir/clustered", "event_type", "k",
      numRangeBuckets = 16)
    // control: same partition dirs, random row order within
    df.repartition(16).write.mode("overwrite")
      .partitionBy("event_type").parquet(s"$dir/random")

    def scanStats(path: String, filter: org.apache.spark.sql.Column)
        : (Long, Long, String) = {
      val prev = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val q = spark.read.parquet(path).where(filter)
        q.collect()
        val scan = q.queryExecution.executedPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }.head
        (scan.metrics("numFiles").value, scan.metrics("numOutputRows").value,
          scan.toString)
      } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    }

    val pred = col("event_type") === "type1" &&
      col("k").between(100000L, 150000L)
    val (filesC, rowsC, planC) = scanStats(s"$dir/clustered", pred)
    val (filesR, rowsR, _) = scanStats(s"$dir/random", pred)
    val (filesAll, _, _) = scanStats(s"$dir/clustered", lit(true))

    // partition pruning: only type1's directory is opened
    assert(planC.contains("PartitionFilters"), planC)
    assert(filesC < filesAll, s"no dir pruning: $filesC of $filesAll files")
    assert(filesR < filesAll * 2) // control reads only its dir too
    // row-group skipping: the clustered scan surfaces only the row groups
    // whose [min,max] overlaps the 5% k band; the random layout's row
    // groups all span ~the full k range, so none are skipped
    assert(rowsC <= n / 8, s"clustered scan surfaced $rowsC rows")
    assert(rowsR >= n / 4 * 9 / 10, s"control unexpectedly pruned: $rowsR")
    // same answer either way
    assert(spark.read.parquet(s"$dir/clustered").where(pred).count() ===
      spark.read.parquet(s"$dir/random").where(pred).count())
  }

  test("z-order layout: predicates on EITHER interleaved dimension skip " +
    "row groups; the x-clustered control skips only on x") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    // full 256×256 grid so tile geometry is exact, n = 65536
    val n = 256 * 256
    val df = (0 until n).map { i =>
      (i.toLong, (i % 256).toLong, (i / 256).toLong)
    }.toDF("id", "x", "y")
    // 64 range buckets over the 16-bit Morton code ≈ 32×32 tiles per file
    TableIO.writeZOrdered(df, s"$dir/zorder", "x", "y", files = 64, bits = 8)
    // control: classic single-column clustering — perfect stats on x,
    // every file spans the FULL y range
    df.repartitionByRange(64, col("x")).sortWithinPartitions("x", "y")
      .write.mode("overwrite").parquet(s"$dir/linear")

    def rowsRead(path: String, filter: org.apache.spark.sql.Column): Long = {
      val prev = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val q = spark.read.parquet(path).where(filter)
        q.collect()
        q.queryExecution.executedPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }.head.metrics("numOutputRows").value
      } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    }

    // y-only band (1/8 of the range): the second clustering dimension —
    // the case single-column layouts cannot skip on at all
    val yOnly = col("y").between(96L, 127L)
    val zY = rowsRead(s"$dir/zorder", yOnly)
    val linY = rowsRead(s"$dir/linear", yOnly)
    assert(zY <= n / 4, s"z layout surfaced $zY rows on a y-only band")
    assert(linY >= n * 9L / 10, s"x-clustered control unexpectedly pruned: $linY")
    // 2-D box deliberately crossing tile boundaries — ideally ≤4 tiles of
    // 1024 rows; repartitionByRange samples its bucket boundaries, so tiles
    // straddle files and the realized read is a few buckets more (n/4 bound)
    val box = col("x").between(56L, 71L) && col("y").between(120L, 135L)
    val zBox = rowsRead(s"$dir/zorder", box)
    assert(zBox <= n / 4, s"z layout surfaced $zBox rows on a 16×16 box")
    // content-lossless: both layouts answer identically
    assert(spark.read.parquet(s"$dir/zorder").where(box).count() ===
      spark.read.parquet(s"$dir/linear").where(box).count())
    assert(spark.read.parquet(s"$dir/zorder").where(yOnly).count() === n / 8)
    // interleave math pinned: x=3 (011), y=5 (101) → 100111b = 39
    val z35 = spark.range(1).select(
      TableIO.zValue(lit(3), lit(5), bits = 3).as("z")).head.getLong(0)
    assert(z35 === 39L)
  }

  test("dynamic partition pruning: a dim-side filter prunes fact dirs at " +
    "runtime (join on the partition column)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val fact = (0 until 20000).map { i =>
      (i.toLong, s"type${i % 4}", i * 3L)
    }.toDF("id", "event_type", "v")
    graft.io.TableIO.writePartitionedClustered(fact, s"$dir/fact",
      "event_type", "id", numRangeBuckets = 16)
    // dim must be a real table (a LocalRelation's filter constant-folds
    // away before the PartitionPruning rule can see it)
    Seq(("type1", "keep"), ("type2", "drop"), ("type3", "drop"),
      ("type0", "drop")).toDF("event_type", "tag")
      .write.mode("overwrite").parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim")

    // DPP needs the non-AQE planner's reused-broadcast subquery to be
    // visible; useStats=false so the tiny test tables pass the cost gate
    val prev = Seq("spark.sql.adaptive.enabled",
      "spark.sql.optimizer.dynamicPartitionPruning.useStats")
      .map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try {
      val q = spark.read.parquet(s"$dir/fact")
        .join(dim.where(col("tag") === "keep"), "event_type")
      q.collect()
      val scan = q.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head // fact scan is the partitioned one
      assert(scan.toString.contains("dynamicpruning"), scan.toString)
      val (files, rows) =
        (scan.metrics("numFiles").value, scan.metrics("numOutputRows").value)
      // only type1's directory is read: ~1/4 of files and exactly 1/4 of rows
      assert(rows === 5000, s"fact scan surfaced $rows rows")
      assert(files <= 8, s"fact scan opened $files files")
      assert(q.count() === 5000)
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("compaction: narrow rewrite (no exchange) cuts file count, " +
    "content lossless") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val docs = Synthesizer.docs(spark, 500, 7L)
      .select(col("doc_id"), to_json(col("spans")).as("spans_json"))
    docs.repartition(32).write.mode("overwrite").parquet(s"$dir/small")
    def nFiles(p: String): Int = new java.io.File(p).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nFiles(s"$dir/small") === 32)
    val n = TableIO.compact(spark, s"$dir/small", s"$dir/out",
      targetFileBytes = 64L * 1024 * 1024)
    assert(n === 1) // 500 tiny docs fit one 64 MB target file
    assert(nFiles(s"$dir/out") === n)
    // compaction must not pay a shuffle: the rewrite plan is exchange-free
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = spark.read.parquet(s"$dir/small").coalesce(n)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"compaction shuffled:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    // lossless: every row survives the rewrite byte-identically
    val a = spark.read.parquet(s"$dir/out").orderBy("doc_id").collect().toSeq
    val b = docs.orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("snapshot commits are isolated: a v1 reader sees v1 bytes after v2 " +
    "commits, latest resolves to v2, and v1 reads only v1 files") {
    import spark.implicits._
    val base = "/tmp/graft_tt_spec"
    new scala.reflect.io.Directory(new java.io.File(base)).deleteRecursively()
    val v1 = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "x")
    TableIO.commitSnapshot(v1, base, 1)
    val v2 = TableIO.readSnapshot(spark, base)
      .where(col("id") =!= 2L).withColumn("x", col("x") + 1L)
    TableIO.commitSnapshot(v2, base, 2)
    val r1 = TableIO.readSnapshot(spark, base, Some(1))
    assert(r1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 10L), (2L, 20L), (3L, 30L)))
    assert(r1.inputFiles.nonEmpty && r1.inputFiles.forall(_.contains("/v1/")),
      s"v1 reader touched non-v1 files: ${r1.inputFiles.mkString(",")}")
    val latest = TableIO.readSnapshot(spark, base)
    assert(latest.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 11L), (3L, 31L)))
  }

  test("ORC interchange: lossless round trip and predicate pushdown into " +
    "the ORC scan") {
    import spark.implicits._
    val base = "/tmp/graft_test_orc_sfNONE_roundtrip"
    new scala.reflect.io.Directory(new java.io.File(base)).deleteRecursively()
    val rows = (0L until 500L).map(i => (i, s"text-$i", i % 7))
    val df = rows.toDF("id", "payload", "bucket")
    df.write.mode("overwrite").format("orc").save(base)
    val back = spark.read.format("orc").load(base)
    assert(back.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).toSet === rows.toSet)
    val filtered = back.where(col("bucket") === 3L)
    val scan = filtered.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.nonEmpty, "expected a FileSourceScanExec over ORC")
    assert(scan.head.metadata("PushedFilters").contains("bucket"),
      s"filter not pushed: ${scan.head.metadata("PushedFilters")}")
    assert(filtered.count() === rows.count(_._3 == 3))
  }
}

/** The driver's smoke check: SparkEntry.entry must return rows. */
class EntrySpec extends AnyFunSuite {
  test("flagship entry returns extracted rows") {
    val df = SparkEntry.entry(SparkTestBase.spark)
    assert(df.count() > 0)
    assert(df.columns.contains("spans"))
  }
}

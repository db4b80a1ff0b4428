package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table IO — the Iceberg `bucket(N, doc_id)` emulation
  * (SURVEY.md §7.1: Iceberg jars are not in /opt/spark/jars, so bucket
  * partitioning is expressed through Spark's native bucketed tables; the
  * IcebergIO seam is this object's interface).
  *
  * Why it matters at 10^12 docs: two tables bucketed+sorted on `doc_id`
  * join WITHOUT a shuffle (verified by TableIOSpec on the physical plan) —
  * the verification join (results vs golden) and incremental-merge jobs
  * stay narrow.
  */
object TableIO {

  /** Write `df` as a managed bucketed table (bucketBy doc_id, sorted within
    * buckets). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int = 32,
                    key: String = "doc_id"): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Equi-join two tables bucketed on the same key — planner elides the
    * shuffle on both sides. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String = "doc_id"): DataFrame =
    spark.table(left).join(spark.table(right), key)

  // ------------------------------------------------------------------
  // Data layout for scan pruning. At 100 TB the fastest scan is the one
  // that never happens: hive-style partition dirs are eliminated at
  // planning time (PartitionFilters), and range-clustering the rows within
  // each partition gives every parquet row group a narrow min/max band on
  // the cluster key, so pushed predicates skip whole row groups at read
  // time. TableIOSpec measures both effects on FileSourceScanExec metrics.

  /** Write with hive-style `partitionBy(partitionCol)` dirs, rows
    * range-clustered on `clusterCol` within each partition (one sorted
    * run per output file ⇒ tight per-row-group min/max stats).
    *
    * `numRangeBuckets` is the TOTAL `repartitionByRange` bucket count across
    * ALL partition values, not per-dir — with V distinct partition values
    * each hive dir receives roughly `numRangeBuckets / V` files. Size it to
    * the job's write parallelism (at 100 TB: ≈ total input bytes / target
    * file size, e.g. 512 MB files). */
  def writePartitionedClustered(df: DataFrame, path: String,
                                partitionCol: String, clusterCol: String,
                                numRangeBuckets: Int = 32): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(numRangeBuckets, col(partitionCol), col(clusterCol))
      .sortWithinPartitions(col(partitionCol), col(clusterCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)
  }

  /** Morton/Z-order value: interleave the low `bits` bits of two
    * non-negative integer columns (x even positions, y odd). Pure integer
    * Column math — constant-folds to a chain of shift/and/or inside
    * whole-stage codegen, no UDF and no custom Expression needed. Inputs
    * are masked to `bits` bits so out-of-range values wrap rather than
    * corrupt the interleave. */
  def zValue(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
             bits: Int = 16): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}
    val xi = x.cast("long")
    val yi = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xi, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(yi, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Z-order clustered layout: range-partition + sort the rows by the
    * Morton value of (`cx`, `cy`) so every output file / parquet row group
    * covers a compact 2-D tile of the key space. Unlike single-column
    * range clustering (tight min/max on ONE column only), BOTH columns get
    * narrow per-row-group stats, so a pushed box predicate on either — or
    * both — dimensions skips most row groups at read time. The Iceberg
    * analogue is `rewrite_data_files(strategy => 'sort', sort_order =>
    * 'zorder(cx, cy)')`; at 100 TB size `files` to total bytes / target
    * file size as in [[writePartitionedClustered]]. */
  def writeZOrdered(df: DataFrame, path: String, cx: String, cy: String,
                    files: Int = 16, bits: Int = 16): Unit = {
    import org.apache.spark.sql.functions.col
    df.withColumn("__z", zValue(col(cx), col(cy), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  // ------------------------------------------------------------------
  // Interchange formats (ingest/egress edges of the pipeline; columnar
  // parquet stays the internal format). Schemas are ALWAYS explicit:
  // inferSchema costs a full extra scan — at 100 TB that is a second job.

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** ORC — the other columnar interchange format warehouse drops arrive
    * in; same predicate-pushdown/column-pruning behavior as parquet. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Schema-EVOLUTION read across heterogeneous parquet drops: merge the
    * footers of every input so columns added by later writers surface as
    * nulls on older rows. mergeSchema costs a footer read per file — on a
    * 10^12-row table pin the evolved schema explicitly with
    * `.schema(...)` instead; this is the ingest-time form for bounded
    * heterogeneous batches. */
  def readParquetMerged(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

  /** JSON-lines (one object per line — splittable, unlike a JSON array). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJsonl(spark: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** JSONL ingest with corrupt-record ROUTING — at 10^12 rows malformed
    * lines are a certainty, FAILFAST kills the job and DROPMALFORMED
    * silently loses data, so the production mode is PERMISSIVE with the
    * raw line preserved in `_corrupt_record`: good rows parse, bad rows
    * carry their original bytes for a quarantine sink + replay. Callers
    * split on `_corrupt_record IS NULL`. Spark caveat (spec-pinned): a
    * query referencing ONLY the corrupt column is disallowed over the raw
    * relation — always keep at least one data column in the projection
    * (or route via a partitioned sink). */
  def readJsonlFlagged(spark: SparkSession, path: String,
                       schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .schema(if (schema.fieldNames.contains("_corrupt_record")) schema
              else schema.add("_corrupt_record",
                org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** CSV twin of `readJsonlFlagged`: PERMISSIVE parse with the raw line
    * quarantined into `_corrupt_record` on type mismatch or column-count
    * underflow (the short row still carries its parsed prefix, missing
    * trailing columns null-padded) — ingest never dies on one bad row,
    * and the quarantine column routes to a rejects sink. The JSONL
    * caveat bites HARDER here (spec-pinned): CSV parses only the
    * projected columns, so whether a short row is flagged depends on
    * the projection — a query that prunes the missing column sees no
    * corruption. Persist/cache the full frame BEFORE filtering on
    * `_corrupt_record` (Spark's own documented contract for this
    * column). */
  def readCsvFlagged(spark: SparkSession, path: String,
                     schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .schema(if (schema.fieldNames.contains("_corrupt_record")) schema
              else schema.add("_corrupt_record",
                org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("header", "false")
      .csv(path)

  /** Small-file COMPACTION — the Iceberg `rewrite_data_files` analogue and
    * the table-maintenance step every long-running ingest needs: streaming
    * micro-batches and per-task writers leave thousands of KB-sized files,
    * and at 10^12 docs the scan's task-scheduling and footer-read overhead
    * becomes O(files), not O(bytes). Rewrites `inPath` into
    * ceil(totalBytes / targetFileBytes) files via `coalesce` — a NARROW
    * rewrite (no exchange: compaction must not pay a shuffle; it only
    * merges splits). Returns the output file count. Row-group clustering
    * is `writePartitionedClustered`'s job — compose the two when both
    * layout and file count need fixing.
    *
    * Contract: `inPath` is ONE flat parquet directory (the census is
    * non-recursive, matching how Spark writes an unpartitioned table).
    * For a hive-partitioned layout, compact each `part=...` dir
    * separately — per-partition compaction is also what keeps the rewrite
    * incremental at 10^12 rows (only dirs with new small files pay). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetFileBytes: Long = 512L * 1024 * 1024): Int = {
    // Hadoop FS, not java.io: inPath is an HDFS/S3 prefix on a real cluster.
    val in = new org.apache.hadoop.fs.Path(inPath)
    val fs = in.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(in)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val n = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes)
      .toInt
    spark.read.parquet(inPath).coalesce(n)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    n
  }

  /** Copy-on-write SNAPSHOT commit — the Iceberg snapshot model over plain
    * parquet: each commit writes its data files under `v<version>/` and
    * publishes a manifest (`_manifests/v<version>.txt`) listing exactly
    * the files that snapshot reads. Data files are immutable once
    * committed; a new version never touches an old version's files, so
    * readers pinned to an older manifest are isolated from concurrent
    * commits (time travel). The manifest write is the commit point. */
  def commitSnapshot(df: DataFrame, table: String, version: Int): Unit = {
    val spark = df.sparkSession
    val dataDir = s"$table/v$version"
    df.write.mode(SaveMode.Overwrite).parquet(dataDir)
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mPath = new org.apache.hadoop.fs.Path(s"$table/_manifests/v$version.txt")
    val out = fs.create(mPath, true)
    out.write((dataDir + "\n").getBytes("UTF-8"))
    out.close()
  }

  /** Snapshot expiry + orphan cleanup (Iceberg `expire_snapshots`): drop
    * every manifest except the newest `keepLast`, then delete data
    * directories no surviving manifest references. Readers pinned to an
    * expired version fail fast at manifest resolution (the time-travel
    * window shrank); latest-readers are untouched. Returns
    * (manifests expired, orphan data dirs deleted). */
  def expireSnapshots(spark: SparkSession, table: String,
                      keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val mDir = new org.apache.hadoop.fs.Path(s"$table/_manifests")
    val fs = mDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = fs.listStatus(mDir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".txt"))
      .map(_.stripPrefix("v").stripSuffix(".txt").toInt).sorted
    val (expire, keep) = versions.splitAt(math.max(0, versions.length - keepLast))
    // surviving manifests' referenced paths (a dir may back several
    // versions under append-style commits; only truly orphaned dirs go)
    val referenced = keep.flatMap { v =>
      val in = fs.open(new org.apache.hadoop.fs.Path(s"$table/_manifests/v$v.txt"))
      val paths = scala.io.Source.fromInputStream(in).getLines().toSeq
      in.close()
      paths
    }.toSet
    var orphans = 0
    expire.foreach { v =>
      val mPath = new org.apache.hadoop.fs.Path(s"$table/_manifests/v$v.txt")
      val in = fs.open(mPath)
      val paths = scala.io.Source.fromInputStream(in).getLines().toSeq
      in.close()
      fs.delete(mPath, false)
      paths.filterNot(referenced.contains).foreach { p =>
        if (fs.delete(new org.apache.hadoop.fs.Path(p), true)) orphans += 1
      }
    }
    (expire.length, orphans)
  }

  /** Time-travel read: load the file list of `version` (or the latest
    * committed version when None) from its manifest and read exactly
    * those files — a v1 reader sees v1 bytes even after v2 commits. */
  def readSnapshot(spark: SparkSession, table: String,
                   version: Option[Int] = None): DataFrame = {
    val mDir = new org.apache.hadoop.fs.Path(s"$table/_manifests")
    val fs = mDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = fs.listStatus(mDir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".txt"))
      .map(_.stripPrefix("v").stripSuffix(".txt").toInt)
    val v = version.getOrElse(versions.max)
    require(versions.contains(v), s"no committed snapshot v$v in $table")
    val in = fs.open(new org.apache.hadoop.fs.Path(s"$table/_manifests/v$v.txt"))
    val paths = scala.io.Source.fromInputStream(in).getLines().toSeq
    in.close()
    spark.read.parquet(paths: _*)
  }
}

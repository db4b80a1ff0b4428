package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic 10× scale-up of a driver testdata dir (sf0.1 → an
  * sf1-shaped dir) for the round-4 scaling campaign: every table is tiled
  * `reps` times with KEY-OFFSET replicas — all primary and foreign keys
  * shift by `replica × stride` consistently, so referential integrity,
  * join fan-outs and per-key group sizes are preserved while row counts
  * grow 10× — and the tiny dimension tables (region, nation) stay
  * single-copy, exactly like a real corpus growing under fixed
  * dimensions. Payload columns (text, vectors, timestamps, prices) are
  * byte-identical across replicas: the corpus acquires exact-duplicate
  * clusters of size `reps` — a realistic dup structure for the dedup
  * family, and a DOCUMENTED one (BASELINE.md) since no oracle gates sf1;
  * the sf1 runs measure scaling and 8-vs-32-core determinism, while
  * correctness stays gated at sf0.01.
  *
  * Strides sit far above every source key range (max source key ≈ 6×10⁵)
  * and far below the 10⁹ offsets pipeline queries use for planted rows,
  * so tiled ids can never collide with either. */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/root/repo/target/testdata_sf1")
    val reps = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tile(name: String, offsets: Map[String, Long],
             outParts: Int): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val out = (0 until reps).map { r =>
        offsets.foldLeft(base) { case (df, (c, stride)) =>
          df.withColumn(c, (col(c) + lit(stride * r)).cast("long"))
        }
      }.reduce(_ unionByName _)
      out.repartition(outParts)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name × $reps → $dst/$name.parquet")
    }
    def copy(name: String): Unit = {
      spark.read.parquet(s"$src/$name.parquet").coalesce(1)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name (single copy)")
    }

    val K = 1000000L   // entity-key stride (cust/supp/part/user/vec)
    val O = 10000000L  // event/order/doc stride
    copy("region")
    copy("nation")
    tile("customer", Map("c_custkey" -> K), 8)
    tile("supplier", Map("s_suppkey" -> K), 2)
    tile("part", Map("p_partkey" -> K), 8)
    tile("orders", Map("o_orderkey" -> O, "o_custkey" -> K), 16)
    tile("lineitem", Map("l_orderkey" -> O, "l_partkey" -> K,
      "l_suppkey" -> K), 64)
    tile("events", Map("event_id" -> O, "user_id" -> K), 16)
    tile("documents", Map("doc_id" -> O), 16)
    tile("embeddings", Map("vec_id" -> K), 8)
    spark.stop()
  }
}

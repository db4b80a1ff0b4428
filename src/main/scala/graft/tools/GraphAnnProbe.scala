package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway tuning probe for the graph-ANN family (recall vs m/hops/ef). */
object GraphAnnProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    val brute = graft.ops.SimilarityOps.bruteTopK(e)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
    for (m <- Seq(4, 8, 16); hops <- Seq(3, 5)) {
      val g = graft.ops.GraphAnnOps.buildKnnGraph(e, m = m).localCheckpoint(true)
      for (ef <- Seq(2, 8, 32)) {
        val vis = graft.ops.GraphAnnOps.beamVisited(e, g, 10, ef, hops)
        val hits = graft.ops.GraphAnnOps.topKFromVisited(e, vis, 10, 10)
          .join(brute, Seq("query_id", "neighbor_id")).count()
        println(s"m=$m hops=$hops ef=$ef visited=${vis.count()} hits=$hits/100")
      }
    }
    s.stop()
  }
}

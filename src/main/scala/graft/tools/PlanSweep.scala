package graft.tools
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    // p07 brute-force ANN deliberately streams the corpus against a tiny
    // broadcast query set with no equi-key — its BroadcastNestedLoopJoin is
    // the intended plan (SimilarityOps.bruteTopK scaladoc), not an
    // accidental cartesian.
    val allowed = Map("p07_ann_brute_topk" -> Set("BroadcastNestedLoop"))
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val smells = Seq("CartesianProduct", "BroadcastNestedLoop")
          .filter(plan.contains)
          .filterNot(allowed.getOrElse(name, Set.empty).contains)
        println(s"PLAN $name ${if (smells.isEmpty) "ok" else "SMELL:" + smells.mkString(",")}")
      } catch { case e: Throwable => println(s"PLAN $name ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}

package graft.tools
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val smells = Seq("CartesianProduct", "BroadcastNestedLoop")
          .filter(plan.contains)
        println(s"PLAN $name ${if (smells.isEmpty) "ok" else "SMELL:" + smells.mkString(",")}")
      } catch { case e: Throwable => println(s"PLAN $name ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}

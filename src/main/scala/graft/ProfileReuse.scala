package graft
import org.apache.spark.sql.SparkSession

/** Scratch: confirm AQE stage reuse in the executed q_dedup_jaccard plan
  * (not part of the contract). */
object ProfileReuse {
  private[graft] def run(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries("q_dedup_jaccard")(spark, "/root/testdata/sf0.01")
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    println("[reuse] ReusedExchange/Stage occurrences: " +
      ("ReusedExchange|ReusedSubquery|StageReuse|reused".r.findAllIn(plan).size))
    println(plan.linesIterator.filter(l => l.contains("Reused") || l.contains("TableCacheQueryStage")).mkString("\n"))
    spark.stop()
  }
}

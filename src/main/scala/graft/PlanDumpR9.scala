package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit helper: dump the formatted physical plan of the named
  * registered queries (args; defaults to the round-9 additions) at
  * sf0.01 — the evidence source for PLANS.md. */
object PlanDumpR9 {
  private[graft] def run(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_sample_temperature", "q_dedup_keep_best", "q_bm25", "q_dedup_containment")
    for (q <- names) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(8000))
    }
    spark.stop()
  }
}

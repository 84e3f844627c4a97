package graft
import org.apache.spark.sql.SparkSession

/** Scratch profiler: time a named subset of registered queries at a given
  * sf dir (not part of the contract). Usage: runMain graft.ProfileRound3 q1 q2... */
object ProfileRound3 {
  private[graft] def run(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val names = if (args.nonEmpty) args.toSeq else Seq("q_embed_ann", "q_dedup_simhash")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[prof] $name%-24s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
      val leaked = spark.sparkContext.getPersistentRDDs
      if (leaked.nonEmpty) println(s"[prof] $name LEAKED ${leaked.size} persistent RDDs")
    }
    spark.stop()
  }
}

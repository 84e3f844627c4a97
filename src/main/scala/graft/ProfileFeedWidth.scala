package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.TxTable

/**
 * changeFeed cost vs commit-log length (round 17, SCALE.md): builds an
 * n-commit log (one tiny upsert per commit — the worst per-commit
 * fixed-cost ratio) and measures feed CONSTRUCTION (planning + chunk
 * spills) separately from execution. The flat per-commit union was
 * superlinear in Catalyst (14.9 s planning + 9.2 s execution at just
 * 40 commits); the chunked spill bounds every plan at `spillEvery`
 * branches, making the whole feed linear at a measured ~0.35 s/commit
 * fixed cost (args: nCommits, default 40).
 */
object ProfileFeedWidth {
  private[graft] def run(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft-fw").toString + "/t"
    TxTable.create(spark, t,
      (0 until 20000).map(i => (i.toLong, 100.0 + i, 0L)).toDF("id", "price", "version"))
    val n = args.headOption.map(_.toInt).getOrElse(40)
    (1 to n).foreach { v =>
      TxTable.upsert(spark, t,
        Seq(((v % 100).toLong, 1000.0 + v, v.toLong)).toDF("id", "price", "version"),
        Seq("id"), "version")
    }
    println(s"[feedwidth] $n commits done")
    val t0 = System.nanoTime()
    val feed = TxTable.changeFeed(spark, t, Seq("id"))
    feed.queryExecution.executedPlan // force planning (chunk spills run here)
    println(f"[feedwidth] feed constructed in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val t1 = System.nanoTime()
    val counts = feed.groupBy("op").count().orderBy("op").collect()
    println(f"[feedwidth] executed in ${(System.nanoTime() - t1) / 1e9}%.1f s: " +
      counts.map(r => s"${r.get(0)}=${r.get(1)}").mkString(" "))
    spark.stop()
  }
}

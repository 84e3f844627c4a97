package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Materialize}

/** Scratch profiler: per-phase timings of the q_dedup_simhash shape at
  * sf0.1 — spilled index, signature aggregate, banded bucket join to
  * candidates, exact verification — to locate its bench seconds. */
object ProfileSimhashPhases {
  private[graft] def run(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[sh] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    for (it <- 1 to 2) {
      val idx = t(s"it$it spill idx") {
        Materialize.viaParquet(Dedup.shingleIndex(docs, "doc_id", "text", 3), s"shp_idx")
      }
      val sigs = t(s"it$it signatures") {
        val s = Materialize.viaParquet(Dedup.simHashSignaturesFromFeats(idx), "shp_sigs")
        s.count(); s
      }
      val cands = t(s"it$it cands (bucket join)") {
        val c = Materialize.viaParquet(
          Dedup.simHashPairsFromFeats(idx).select(col("id_a"), col("id_b")), "shp_cands")
        System.err.println(s"[sh] cands=${c.count()}"); c
      }
      t(s"it$it verify") {
        val v = Dedup.verifyJaccardOnIndex(cands, idx).filter(col("jaccard") >= 0.9)
        System.err.println(s"[sh] verified=${v.count()}")
      }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Round-12 phase profile: where do the similarity trio's seconds go at
  * sf0.1 — corpus construction, IMI index build, candidate join, exact
  * verify, CC loop? Drives the decision whether a vectorized two-half
  * Lloyd (the pqEncode pattern) is worth the oracle re-verification. */
object ProfileR12 {
  private def t[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[r12] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    r
  }

  private[graft] def run(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")

    val (corpus0, nC) = t("clusteredEmbeddings (lazy)")(
      PipelineQueries.clusteredEmbeddings(emb))
    val corpus = t("corpus spill")(
      graft.operators.Materialize.viaParquet(corpus0, "r12_corpus"))
    println(s"[r12] nC=$nC")
    t("imiPairs cands+verify")(
      Similarity.imiPairs(corpus, "vec_id", "embedding",
        nAssign = 2, minCos = 0.9).write.format("noop").mode("overwrite").save())
    val pairs = Similarity.imiPairs(corpus, "vec_id", "embedding",
        nAssign = 2, minCos = 0.9)
      .select(col("id_a"), col("id_b"))
    t("clusterPairs on the edges")(
      Dedup.clusterPairs(pairs).write.format("noop").mode("overwrite").save())
    t("q_dedup_semantic end-to-end")(
      SparkEntry.queries("q_dedup_semantic")(spark, dir)
        .write.format("noop").mode("overwrite").save())
    t("q_knn_classify_ann end-to-end")(
      SparkEntry.queries("q_knn_classify_ann")(spark, dir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}

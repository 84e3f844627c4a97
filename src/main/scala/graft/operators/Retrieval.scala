package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus retrieval scoring — the ranking pass a training-data pipeline
 * runs to probe eval-set leakage or mine topical subsets from a crawl.
 *
 * Scale shape: the corpus scan keeps only query-term hits (explode +
 * broadcast-literal IN filter prunes to |Q| terms BEFORE any shuffle, so
 * the tf aggregate carries hit rows, not tokens); document frequency /
 * idf is a |Q|-row broadcast; document length is per-row `size()` — no
 * second pass over the corpus; the caller's top-k lands as
 * TakeOrderedAndProject. Nothing here is ever wider than the hit set.
 */
object Retrieval {

  /**
   * Okapi BM25 (Robertson–Walker–Jones, TREC-3; the textbook constants
   * k1 = 1.2, b = 0.75) of each document against a fixed term set.
   * Returns (idCol, n_terms, score) for documents matching ≥ 1 term.
   *
   * Per-term contributions are rounded to 6dp and summed as
   * DECIMAL(18,6): the per-doc score is then order-independent and
   * engine-exact (the repo's decimal-sum convention), so ranks oracle
   * across engines. idf = ln(1 + (N − df + ½)/(df + ½)) — the
   * non-negative Lucene form.
   */
  def bm25(df: DataFrame, idCol: String, textCol: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs a non-empty query term set")
    contributions(df, idCol, textCol, terms, k1, b)
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_terms"),
        sum(col("__c")).cast("double").as("score"))
  }

  /**
   * Batched BM25: a SET of named queries scored in one corpus pass —
   * the per-(doc, term) contributions build once over the union of all
   * query terms, then a broadcast (query, term) map fans each
   * contribution out to the queries that asked for the term. Returns
   * (query_id, rank, idCol, score), top `kTop` per query, rank by
   * (score desc, id) on the decimal-exact score so ranks oracle.
   */
  def bm25Multi(df: DataFrame, idCol: String, textCol: String,
      queries: Seq[(String, Seq[String])], kTop: Int = 5,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "bm25Multi needs non-empty queries with non-empty term sets")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val allTerms = queries.flatMap(_._2).distinct
    val qmap = queries.flatMap { case (q, ts) => ts.distinct.map(t => (q, t)) }
      .toDF("query_id", "__term")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(idCol))
    contributions(df, idCol, textCol, allTerms, k1, b)
      .join(broadcast(qmap), "__term")
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("__c")).cast("double").as("score"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= kTop)
      .select(col("query_id"), col("rank"), col(idCol), col("score"))
  }

  /** Per-(doc, term) 6dp-decimal BM25 contributions over the hit set. */
  private def contributions(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double, b: Double): DataFrame = {
    val docs = df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"), size(col("__toks")).cast("long").as("__dl"))
    // exact integer sum then ONE division — cross-engine deterministic,
    // unlike engine-native AVG over doubles
    val stats = docs.agg(count(lit(1)).as("__n_docs"),
      (sum(col("__dl")).cast("double") / count(lit(1))).as("__avgdl"))
    val hits = docs.select(col(idCol), col("__dl"), explode(col("__toks")).as("__term"))
      .filter(col("__term").isInCollection(terms))
    val tf = hits.groupBy(col(idCol), col("__dl"), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    val dfreq = hits.groupBy(col("__term")).agg(countDistinct(col(idCol)).as("__df"))
    tf.join(broadcast(dfreq), "__term").crossJoin(broadcast(stats))
      .withColumn("__idf", log(lit(1.0)
        + (col("__n_docs") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))))
      .withColumn("__c", round(col("__idf") * col("__tf") * lit(k1 + 1.0)
        / (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))),
        6).cast("decimal(18,6)"))
  }
}

package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor / similarity search over embedding columns
 * (SURVEY.md §2.11). Baseline: brute-force cosine top-k (one broadcast of
 * the query set, one linear scan — the right plan even at 100 TB when the
 * query set is small). Scale path: LSH-bucketed search, where candidates
 * come from signature-band equality joins instead of a cross product.
 */
object Similarity {

  /** Cosine top-k neighbors of one stored vector (`queryId`), excluding
    * itself. The single query row is broadcast; the scan is one pass. */
  def topKForId(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, kTop: Int): DataFrame = {
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qvec"))
    emb.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos", cosine(col(vecCol), col("__qvec")))
      .select(col(idCol), round(col("cos"), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(kTop)
  }

  /** Brute-force cosine top-k for a whole (small, broadcastable) query set:
    * returns per-query ranked neighbors via window row_number. */
  def topKForQueries(emb: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, qIdCol: String, qVecCol: String, kTop: Int): DataFrame = {
    val scored = emb.crossJoin(broadcast(queries))
      .filter(col(idCol) =!= col(qIdCol))
      .withColumn("cos", cosine(col(vecCol), col(qVecCol)))
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("cos").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kTop)
      .select(col(qIdCol).as("query_id"), col(idCol).as("neighbor_id"),
        round(col("cos"), 4).as("cos_sim"), col("rank"))
  }

  /**
   * LSH-bucketed ANN: random-hyperplane signatures band-joined to form a
   * candidate set, cosine re-rank inside buckets. Recall is tunable via
   * (bits, bands); cost is Σ_bucket freq² instead of n².
   */
  def annPairs(emb: DataFrame, idCol: String, vecCol: String,
      bits: Int = 16, bands: Int = 4, minCos: Double = 0.0): DataFrame = {
    val width = bits / bands
    val mask = (1L << width) - 1
    val sigs = emb.select(col(idCol).as("id"), col(vecCol).as("vec"),
        lshSignature(col(vecCol), bits).as("sig")).cache()
    val buckets = sigs.select(col("id"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("sig"), b * width).bitwiseAND(mask).as("bucket"))): _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.bucket"))
    val cands = buckets.as("x").join(buckets.as("y"), Seq("band", "bucket"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    cands
      .join(sigs.select(col("id").as("id_a"), col("vec").as("vec_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("vec").as("vec_b")), "id_b")
      .withColumn("cos_sim", round(cosine(col("vec_a"), col("vec_b")), 4))
      .filter(col("cos_sim") >= minCos)
      .select("id_a", "id_b", "cos_sim")
  }

  /** Per-group vector mean (centroids) — posexplode + groupBy, the
    * distributed formulation of a vector-average aggregate: partial sums
    * combine map-side, nothing is collected. */
  def centroids(emb: DataFrame, groupCol: String, vecCol: String): DataFrame =
    emb.select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col(groupCol), col("pos"))
      .agg(avg(col("v").cast("double")).as("mean_v"))
}

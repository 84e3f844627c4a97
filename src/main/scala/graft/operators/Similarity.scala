package graft.operators

import graft.functions.VectorFunctions._
import graft.plans.GraftExtensions
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
      .withColumn("cos", GraftExtensions.graftCosine(emb.sparkSession, col(vecCol), col("__qvec")))
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
      .withColumn("cos", GraftExtensions.graftCosine(emb.sparkSession, col(vecCol), col(qVecCol)))
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
  /**
   * Random-hyperplane LSH signatures, relationally: posexplode the vector
   * once, compute all `bits` signed projections as codegen'd conditional
   * sums in ONE hash-aggregate (map-side partials, single shuffle), then
   * pack sign bits. Same plan shape as Dedup.minHashSignatures — the
   * nested fold formulation (VectorFunctions.lshSignature) is kept for
   * small/columnar use but is interpreted and per-row serial.
   */
  def lshSignatures(emb: DataFrame, idCol: String, vecCol: String,
      bits: Int, seed: Int = 42): DataFrame = {
    val parts = emb.select(col(idCol).as("id"),
      posexplode(col(vecCol)).as(Seq("d", "x")))
    val projs = (0 until bits).map { j =>
      sum(when(pmod(xxhash64(lit(seed), lit(j) * 65537 + col("d")), lit(2)) === 0,
        col("x").cast("double")).otherwise(-col("x").cast("double"))).as(s"p$j")
    }
    parts.groupBy(col("id"))
      .agg(projs.head, projs.tail: _*)
      .select(col("id"),
        (0 until bits).map(j => when(col(s"p$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce((a, c) => a.bitwiseOR(c)).as("sig"))
  }

  /**
   * Band width tuning is the scale lever: candidate count for random data
   * ≈ bands · n²/2 · 2^-width. 8-bit bands over a 32-bit signature keep
   * the re-rank set ~1/60th of the 4-bit variant while still catching
   * genuinely similar vectors (their sign bits agree far above chance).
   * Norms are precomputed per vector so re-ranking costs ONE fold (dot).
   */
  def annPairs(emb: DataFrame, idCol: String, vecCol: String,
      bits: Int = 32, bands: Int = 4, minCos: Double = 0.0): DataFrame = {
    val width = bits / bands
    val mask = (1L << width) - 1
    val sigs = lshSignatures(emb, idCol, vecCol, bits)
      .join(emb.select(col(idCol).as("id"), col(vecCol).as("vec")), "id")
      .withColumn("nrm", sqrt(GraftExtensions.graftDot(emb.sparkSession, col("vec"), col("vec"))))
      .cache()
    val buckets = sigs.select(col("id"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("sig"), b * width).bitwiseAND(mask).as("bucket"))): _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.bucket"))
    val cands = buckets.as("x").join(buckets.as("y"), Seq("band", "bucket"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    cands
      .join(sigs.select(col("id").as("id_a"), col("vec").as("vec_a"), col("nrm").as("nrm_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("vec").as("vec_b"), col("nrm").as("nrm_b")), "id_b")
      .withColumn("cos_sim",
        round(GraftExtensions.graftDot(emb.sparkSession, col("vec_a"), col("vec_b")) / (col("nrm_a") * col("nrm_b")), 4))
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

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

import graft.operators.{Dedup, Similarity}
import graft.RelationalQueries.rd
import graft.PipelineQueries.clusteredEmbeddings

/**
 * SAMPLED-SUBSET oracles for the quadratic family (round 13) — the 10×
 * scale-parity gate for the seven queries whose full DuckDB oracle is an
 * O(n²) embedding self-join (25 G multiply-adds at the sf1 corpus; the
 * other 15 quadratic-SHINGLE oracles measured ≤ 31 s at sf1 and are
 * gated in FULL).
 *
 * Contract: the Spark side runs the REGISTERED operator construction
 * unchanged — full candidate generation, full verification — and only
 * the COMPARISON is restricted to a deterministic id-slice
 * (`id % [[SliceMod]] == 0`, ~1% of one pair side). The DuckDB side
 * re-derives exactly that slice with the restriction pushed into the
 * pair enumeration, so its cost drops from n²·d to (n/101)·n·d while
 * every sliced row still crosses engines value-for-value. Per-id
 * computations (kNN votes) and pair predicates (cos ≥ τ) depend only on
 * the full corpus — never on other SLICED rows — so filter-after equals
 * restrict-before by construction.
 *
 * The two connected-components queries (q_dedup_semantic,
 * q_dedup_hybrid) cannot slice their cluster OUTPUT (a cluster id
 * depends on the global edge set), so their sampled gate pins the EDGE
 * RELATION the CC consumes — the quadratic part; the CC loop itself is
 * full-gated at 10× through q_dedup_clusters / q_dedup_keep_best, whose
 * shingle-join oracles stay tractable.
 *
 * These run ONLY under `SPARK_GRAFT_SAMPLED=1` (graft.Verify); the
 * sf0.01 driver gate keeps the registered full-output queries.
 */
object SampledQueries {

  /** Slice modulus: keeps ~1% of the probe side (198 of 20 000 vectors at
    * sf1) — large enough that every family (near-dup cluster, isotropic
    * tail) lands in the slice, small enough that DuckDB's side is ~200×n
    * instead of n². Env-overridable (round 14) so the SAME recipe gates
    * 100×: `SPARK_GRAFT_SLICE_MOD=1009` keeps ~198 probes of the 200 k
    * sf10 corpus, holding DuckDB's cost at ~200×n while n grows 10× —
    * the modulus scales WITH the corpus, the probe count stays fixed.
    * Both the Spark-side filter and the generated oracle SQL read this
    * one value, so the two sides can never disagree on the slice. */
  val SliceMod: Int = sys.env.getOrElse("SPARK_GRAFT_SLICE_MOD", "101").toInt

  private val sliceA = col("id_a") % SliceMod === 0
  private def emb(s: SparkSession, dir: String) = rd(s, dir, "embeddings")

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(

    // exact all-pairs cosine: top-50 of the slice (registered query =
    // top-50 global); the full block-matrix pass still runs on Spark
    "q_embed_pairs" -> ((s, dir) => {
      Similarity.exactCosinePairs(emb(s, dir), "vec_id", "embedding")
        .filter(sliceA)
        .orderBy(col("cos_sim").desc, col("id_a"), col("id_b"))
        .limit(50)
    }),

    // sketch-cut ANN at the 0.45 operating point, sliced — equality with
    // the sliced EXACT enumeration is the measured recall-1.0 claim
    "q_embed_ann" -> ((s, dir) => {
      Similarity.annPairs(emb(s, dir), "vec_id", "embedding", minCos = 0.45)
        .filter(sliceA)
        .orderBy(col("cos_sim").desc, col("id_a"), col("id_b"))
        .limit(100)
    }),

    // IVF ∪ sketch candidates, exact-verified, sliced
    "q_embed_ivf_pairs" -> ((s, dir) => {
      Similarity.multiIndexPairs(emb(s, dir), "vec_id", "embedding",
          iters = 2, nAssign = 2, minCos = 0.45)
        .filter(sliceA)
        .orderBy(col("cos_sim").desc, col("id_a"), col("id_b"))
    }),

    // exact 5-NN vote: per-id output is independent across ids, so the
    // sliced rows equal the sliced-probe oracle exactly
    "q_knn_classify" -> ((s, dir) => {
      Similarity.knnClassify(emb(s, dir), "vec_id", "embedding", "label", k = 5)
        .filter(col("id") % SliceMod === 0)
        .orderBy(col("id"))
    }),

    // IMI-candidate 5-NN vote on the clustered corpus, sliced — the 10×
    // recall gate for the IMI feed (a missed neighbor flips a vote row)
    "q_knn_classify_ann" -> ((s, dir) => {
      val (corpus, _) = clusteredEmbeddings(emb(s, dir))
      Similarity.knnClassify(corpus, "vec_id", "embedding", "label", k = 5,
          candidates = Some(Similarity.imiPairs(corpus,
            "vec_id", "embedding", nAssign = 2, minCos = -1.0)))
        .filter(col("id") % SliceMod === 0)
        .orderBy(col("id"))
    }),

    // auto-switching cosine facade (round 14) — picks the IMI tier at
    // its registered operating point; sliced like the rest of the
    // vector-quadratic family
    "q_embed_auto" -> ((s, dir) => {
      val (corpus, _) = clusteredEmbeddings(emb(s, dir))
      Similarity.cosinePairsAuto(corpus, "vec_id", "embedding",
          minCos = 0.9, bruteMaxDocs = 100L)
        .filter(sliceA)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // semantic-dedup EDGE relation (cos ≥ 0.9 on the clustered corpus),
    // sliced — pins IMI candidate recall at 10×; the CC consuming these
    // edges is full-gated via q_dedup_clusters
    "q_dedup_semantic" -> ((s, dir) => {
      val (corpus, _) = clusteredEmbeddings(emb(s, dir))
      Similarity.imiPairs(corpus, "vec_id", "embedding",
          nAssign = 2, minCos = 0.9)
        .filter(sliceA)
        .select(col("id_a"), col("id_b"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // hybrid edge relation: exact-text edges ∪ semantic edges, sliced
    "q_dedup_hybrid" -> ((s, dir) => {
      val docs = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      val doubled = docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 100000L))
      val textPairs = Dedup.exactDedupFlags(doubled, "doc_id", "text")
        .filter(col("is_dup") === 1)
        .select(col("keep_id").as("id_a"), col("doc_id").as("id_b"))
      val (corpus, _) = clusteredEmbeddings(emb(s, dir))
      val semPairs = Similarity.imiPairs(corpus, "vec_id", "embedding",
          nAssign = 2, minCos = 0.9)
        .select(col("id_a"), col("id_b"))
      textPairs.unionByName(semPairs).distinct()
        .filter(sliceA)
        .orderBy(col("id_a"), col("id_b"))
    }))

  /** The cos≥τ sliced exact pair enumeration over a corpus relation
    * named `src` (probe side restricted to the slice). */
  private def slicedPairsSql(src: String, pred: String, tail: String) =
    s"""parts AS (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             UNNEST(a.embedding) AS x, UNNEST(b.embedding) AS y
           FROM $src a, $src b
           WHERE a.vec_id % $SliceMod = 0 AND a.vec_id < b.vec_id),
         comp AS (
           SELECT id_a, id_b,
             SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
             SQRT(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS na,
             SQRT(SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))) AS nb
           FROM parts GROUP BY id_a, id_b)
         SELECT id_a, id_b$pred
         FROM comp $tail"""

  // ONE definition of the clustered-corpus SQL mirror (round-13 review:
  // this was a verbatim copy of PipelineQueries' — three coupled
  // definitions of the same construction is how gates silently drift)
  private val ClusteredCorpusSql = PipelineQueries.ClusteredCorpusSql

  /** Sliced directed kNN-vote pipeline over corpus relation `src`. */
  private def slicedKnnSql(src: String) =
    s"""parts AS (
           SELECT q.vec_id AS id, b.vec_id AS nbr,
             UNNEST(q.embedding) AS x, UNNEST(b.embedding) AS y
           FROM $src q, $src b
           WHERE q.vec_id % $SliceMod = 0 AND b.vec_id <> q.vec_id),
         comp AS (
           SELECT id, nbr,
             SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
             SQRT(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS na,
             SQRT(SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))) AS nb
           FROM parts GROUP BY id, nbr),
         pairs AS (SELECT id, nbr, ROUND(dot / (na * nb), 4) AS cos_sim FROM comp),
         topk AS (
           SELECT id, nbr, cos_sim FROM (
             SELECT id, nbr, cos_sim,
               row_number() OVER (PARTITION BY id ORDER BY cos_sim DESC, nbr) AS rnk
             FROM pairs) WHERE rnk <= 5),
         votes AS (
           SELECT t.id, e.label AS nbr_label, COUNT(*) AS n_votes,
             SUM(CAST(ROUND(t.cos_sim * 10000, 0) AS BIGINT)) AS score_i
           FROM topk t JOIN $src e ON t.nbr = e.vec_id
           GROUP BY t.id, e.label),
         pred AS (
           SELECT id, nbr_label, n_votes FROM (
             SELECT id, nbr_label, n_votes,
               row_number() OVER (
                 PARTITION BY id ORDER BY n_votes DESC, score_i DESC, nbr_label) AS vr
             FROM votes) WHERE vr = 1)
         SELECT e.vec_id AS id, e.label, p.nbr_label AS pred_label,
           CAST(p.n_votes AS INT) AS n_votes,
           CASE WHEN e.label = p.nbr_label THEN 1 ELSE 0 END AS is_correct
         FROM $src e JOIN pred p ON e.vec_id = p.id ORDER BY id"""

  val oracleSql: ListMap[String, String] = ListMap(
    "q_embed_pairs" ->
      s"""WITH ${slicedPairsSql("embeddings",
            ", ROUND(dot / (na * nb), 4) AS cos_sim",
            "ORDER BY cos_sim DESC, id_a, id_b LIMIT 50")}""",
    "q_embed_ann" ->
      s"""WITH ${slicedPairsSql("embeddings",
            ", ROUND(dot / (na * nb), 4) AS cos_sim",
            "WHERE ROUND(dot / (na * nb), 4) >= 0.45 ORDER BY cos_sim DESC, id_a, id_b LIMIT 100")}""",
    "q_embed_ivf_pairs" ->
      s"""WITH ${slicedPairsSql("embeddings",
            ", ROUND(dot / (na * nb), 4) AS cos_sim",
            "WHERE ROUND(dot / (na * nb), 4) >= 0.45 ORDER BY cos_sim DESC, id_a, id_b")}""",
    "q_knn_classify" ->
      s"""WITH ${slicedKnnSql("embeddings")}""",
    "q_knn_classify_ann" ->
      s"""WITH $ClusteredCorpusSql, ${slicedKnnSql("corpus")}""",
    "q_embed_auto" ->
      s"""WITH $ClusteredCorpusSql, ${slicedPairsSql("corpus",
            ", ROUND(dot / (na * nb), 4) AS cos_sim",
            "WHERE ROUND(dot / (na * nb), 4) >= 0.9 ORDER BY id_a, id_b")}""",
    "q_dedup_semantic" ->
      s"""WITH $ClusteredCorpusSql, ${slicedPairsSql("corpus",
            "",
            "WHERE ROUND(dot / (na * nb), 4) >= 0.9 ORDER BY id_a, id_b")}""",
    "q_dedup_hybrid" ->
      s"""WITH $ClusteredCorpusSql,
         d AS (
           SELECT doc_id, text FROM documents
           UNION ALL SELECT doc_id + 100000, text FROM documents),
         tg AS (SELECT text, MIN(doc_id) AS mn FROM d GROUP BY text HAVING COUNT(*) > 1),
         tp AS (
           SELECT tg.mn AS id_a, d.doc_id AS id_b
           FROM d JOIN tg ON d.text = tg.text AND d.doc_id > tg.mn),
         parts AS (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             UNNEST(a.embedding) AS x, UNNEST(b.embedding) AS y
           FROM corpus a, corpus b
           WHERE a.vec_id % $SliceMod = 0 AND a.vec_id < b.vec_id),
         comp AS (
           SELECT id_a, id_b,
             SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
             SQRT(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS na,
             SQRT(SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))) AS nb
           FROM parts GROUP BY id_a, id_b),
         sp AS (SELECT id_a, id_b FROM comp
                WHERE ROUND(dot / (na * nb), 4) >= 0.9)
         SELECT id_a, id_b FROM (
           SELECT id_a, id_b FROM tp UNION SELECT id_a, id_b FROM sp)
         WHERE id_a % $SliceMod = 0 ORDER BY id_a, id_b""")
}

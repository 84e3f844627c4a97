package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Materialize, Similarity}

/**
 * 100× rehearsal (round 12, SCALE.md): synthesize "sf10" — 100× the bench
 * SF (sf0.1) — and push the two honest quadratics through it:
 * `q_dedup_simhash` (fixed 64-bit signature ⇒ O(n²/2^bits) bucket join)
 * and `q_embed_ann` (isotropic corpus ⇒ irreducible O(n²) sketch pass).
 * The goal is not a wall-clock trophy but the ENGAGEMENT THRESHOLDS of
 * the two escape hatches, tuned from data:
 *
 *   - simhash `hotBucketCap`: at what bucket occupancy f does second-level
 *     re-banding beat the un-split popcount join? Measured via an occupancy
 *     census (predicted Σf² per cap — exact, cheap) plus timed runs at the
 *     runnable caps.
 *   - ann `minEstCos`: at what corpus size must the sketch cut rise above
 *     the default 0.25? Measured via ONE quadratic histogram pass over
 *     est-cos (every cut's candidate count at once) plus timed top-100
 *     runs at the raised cuts, checked identical.
 *
 * Scale-up design (same invariant as [[ProfileScale]]): replicas must not
 * create cross-replica near-dups. Documents get a per-replica token
 * namespace (disjoint shingle spaces). Embeddings CANNOT reuse sf1's
 * cyclic component rotation — 100 replicas > 64 dims, shifts would repeat
 * — so each replica r > 0 multiplies components by a deterministic ±1
 * pattern (splitmix-style bit mix of (r, i)): intra-replica pairwise
 * cosines are preserved EXACTLY (⟨s·x, s·y⟩ = Σ s_i² x_i y_i = ⟨x,y⟩),
 * cross-replica pairs decorrelate to the isotropic noise floor.
 * Not part of the driver contract.
 */
object ProfileScale100 {
  val Sf10Dir = "/tmp/graft_sf10"
  val Replicas = 100

  /** Deterministic ±1 per (replica, component): splitmix64 finalizer. */
  private def signs(r: Int): Seq[Float] = (0 until 64).map { i =>
    var z = r.toLong * 64L + i + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    if ((z & 1L) == 0L) 1.0f else -1.0f
  }

  private def synthesize(spark: SparkSession, src: String): Unit = {
    if (!new java.io.File(s"$Sf10Dir/documents.parquet").exists()) {
      val docs = spark.read.parquet(s"$src/documents.parquet")
      (0 until Replicas).map { r =>
        docs.withColumn("doc_id", col("doc_id") + lit(r * 10000000L))
          .withColumn("text",
            if (r == 0) col("text")
            else concat_ws(" ", transform(split(col("text"), " +"),
              t => concat(t, lit(s"_$r")))))
      }.reduce(_ unionByName _)
        .repartition(64)
        .write.mode("overwrite").parquet(s"$Sf10Dir/documents.parquet")
      println(s"[scale100] wrote $Sf10Dir/documents.parquet")
    }
    if (!new java.io.File(s"$Sf10Dir/embeddings.parquet").exists()) {
      val emb = spark.read.parquet(s"$src/embeddings.parquet")
      (0 until Replicas).map { r =>
        val base = emb.withColumn("vec_id", col("vec_id") + lit(r * 10000000L))
        if (r == 0) base
        else base.withColumn("embedding",
          zip_with(col("embedding"), typedlit(signs(r)), (x, s) => x * s))
      }.reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$Sf10Dir/embeddings.parquet")
      println(s"[scale100] wrote $Sf10Dir/embeddings.parquet")
    }
    if (!new java.io.File(s"$Sf10Dir/orders.parquet").exists()) {
      // orders at 100×: disjoint orderkey/custkey spaces, ~15M rows — the
      // CDC/MV tier's fact table (round 12 cdc probe)
      val ord = spark.read.parquet(s"$src/orders.parquet")
      (0 until Replicas).map { r =>
        ord.withColumn("o_orderkey", col("o_orderkey") + lit(r * 10000000L))
          .withColumn("o_custkey", col("o_custkey") + lit(r * 1000000L))
      }.reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$Sf10Dir/orders.parquet")
      println(s"[scale100] wrote $Sf10Dir/orders.parquet")
    }
  }

  private def time[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scale100] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  /** Occupancy census: per hotBucketCap, the exact popcount-comparison
    * count the bucket join would execute — Σ f·(f−1)/2 over (band,bucket)
    * groups for the un-split part, and for buckets above the cap the
    * re-banded Σ over (band,bucket,band2,bucket2) sub-groups. Pure
    * aggregates over the signature table: the predicted cost of a config
    * without running its join. */
  private def simhashCensus(spark: SparkSession, idx: DataFrame,
      caps: Seq[Int]): Unit = {
    val sigs = Materialize.viaParquet(
      Dedup.simHashSignaturesFromFeats(idx), "s100_sigs")
    // r13: tracks the operator default (radius 14 ⇒ 15 bands; the r12
    // census numbers in SCALE.md §100× were taken at 13 — narrower bands
    // mean ~1.5× hotter buckets, so the cap engagement moved and was
    // re-measured this round)
    val bands = 15
    val buckets = sigs.select(col("id"), col("sig"),
        explode(graft.functions.TextFunctions.simHashBands(col("sig"), bands)).as("bk"))
      .select(col("sig"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    val f1 = Materialize.viaParquet(
      buckets.groupBy("band", "bucket").agg(count(lit(1)).as("f")), "s100_f1")
    val stats = f1.agg(count(lit(1)).as("n_buckets"), max("f").as("max_f"),
      expr("percentile(f, 0.5)").as("med_f"),
      sum(col("f") * (col("f") - 1)).as("pairs2")).collect()(0)
    println(s"[scale100] simhash census: buckets=${stats.getLong(0)} " +
      s"max_f=${stats.getLong(1)} med_f=${stats.getDouble(2)} " +
      s"pairs_unsplit=${stats.getLong(3) / 2}")
    // second-level sub-bucket sizes for every first-level bucket (computed
    // once, filtered per cap): rotate-by-3 re-banding, same as the operator
    val rot = 3
    val sig2 = shiftleft(col("sig"), rot).bitwiseOR(shiftrightunsigned(col("sig"), 64 - rot))
    val f2 = Materialize.viaParquet(
      buckets.withColumn("bk2", explode(graft.functions.TextFunctions.simHashBands(sig2, bands)))
        .groupBy(col("band"), col("bucket"), col("bk2.band").as("band2"),
          col("bk2.bucket").as("bucket2"))
        .agg(count(lit(1)).as("g")), "s100_f2")
    caps.foreach { cap =>
      val cold = f1.filter(col("f") <= cap)
        .agg(coalesce(sum(col("f") * (col("f") - 1)), lit(0L))).collect()(0).getLong(0) / 2
      val hotRows = f1.filter(col("f") > cap)
      val hot = f2.join(hotRows.select("band", "bucket"), Seq("band", "bucket"))
        .agg(coalesce(sum(col("g") * (col("g") - 1)), lit(0L))).collect()(0).getLong(0) / 2
      val nHot = hotRows.count()
      println(s"[scale100] cap=$cap hot_buckets=$nHot predicted_popcounts=${cold + hot} " +
        s"(cold $cold + rebanded $hot)")
    }
  }

  private[graft] def run(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    synthesize(spark, src)
    val which = if (args.nonEmpty) args.toSet else Set("census", "simhash", "ann")

    if (which("census") || which("simhash")) {
      val docs = spark.read.parquet(s"$Sf10Dir/documents.parquet")
      val idx = time("shingle index (500k docs)") {
        Materialize.viaParquet(Dedup.shingleIndex(docs, "doc_id", "text", 3), "s100_idx")
      }
      if (which("census"))
        time("simhash occupancy census") {
          simhashCensus(spark, idx, Seq(20000, 10000, 5000, 2500, 1000))
        }
      if (which("simhash")) {
        // candidate-stage wall per cap (the quadratic under test); counts
        // must agree — the re-banding recall guarantee is exact. The
        // census says the contrast set is {dormant, 28-hot, all-split}:
        // every cap below ~16k splits everything and predicts the same
        // 43.2e9 popcounts.
        Seq(Int.MaxValue, 20000, 10000).foreach { cap =>
          val n = time(s"simhash candidates cap=$cap") {
            Dedup.simHashPairsFromFeats(idx, hotBucketCap = cap)
              .select("id_a", "id_b").count()
          }
          println(s"[scale100] cap=$cap candidate_pairs=$n")
        }
        // the registered FLAT-shape alternative at the same scale: minhash
        // banded LSH — the asymptotic escape the docs should point at
        val docs100 = spark.read.parquet(s"$Sf10Dir/documents.parquet")
        val nMin = time("minhash candidates (same corpus)") {
          Dedup.minHashPairs(docs100, "doc_id", "text").count()
        }
        println(s"[scale100] minhash candidate_pairs=$nMin")
      }
    }

    if (which("trio")) {
      // the REGISTERED scale path at 100×: the clustered-corpus IMI
      // queries on 200k vectors (nC = 10k clusters, kPerHalf = 100 →
      // 10k product cells; assignment n·2·√k = 4e7 dots, pair stage
      // Σcell² ≈ 4e6). These are the queries whose 10× rows SCALE.md
      // already carries — this extends the series a decade.
      Seq("q_dedup_semantic", "q_dedup_hybrid", "q_knn_classify_ann",
          "q_ann_incremental", "q_dedup_semantic_incremental").foreach { name =>
        val fn = SparkEntry.queries(name)
        time(s"$name @sf10")(
          fn(spark, Sf10Dir).write.format("noop").mode("overwrite").save())
      }
    }

    if (which("textdedup")) {
      // round 13: the two REGISTERED text-dedup escape paths at 100× —
      // the shapes the simhash docstring tells users to switch to past
      // ~10⁵ docs. PPJoin prefix at t=0.8 (exact, recall guaranteed by
      // Lemma 1) and the Δ×corpus incremental flags (5 k new docs vs
      // the 495 k standing corpus — the nightly ingest shape).
      val docs = spark.read.parquet(s"$Sf10Dir/documents.parquet")
      val nPrefix = time("jaccardPairsThresholded t=0.8 (500k docs)") {
        Dedup.jaccardPairsThresholded(docs, "doc_id", "text", minJaccard = 0.8).count()
      }
      println(s"[scale100] ppjoin pairs(>=0.8)=$nPrefix")
      val newDocs = docs.filter(col("doc_id") < 10000000L)   // replica 0: 5k docs
      val corpus = docs.filter(col("doc_id") >= 10000000L)   // replicas 1..99
      val nInc = time("incrementalDedupFlags 5k vs 495k") {
        Dedup.incrementalDedupFlags(newDocs, corpus, "doc_id", "text").count()
      }
      println(s"[scale100] incremental flags rows=$nInc")
    }

    if (which("image")) {
      // round 13: the perceptual image-dedup tier at 100× — 500 k docs
      // ⇒ 571 k PNGs (noisy twins included). The cost profile is decode
      // + hash (linear, the dominant term: one real ImageIO decode per
      // image) then the banded bucket join (Σf² over ~9-bit buckets).
      import graft.operators.Multimodal
      val docs = spark.read.parquet(s"$Sf10Dir/documents.parquet").select("doc_id")
      val corpus = Multimodal.attachPngCorpus(docs)
      val hashes = time("imageAHash (571k PNGs encode+decode+hash)") {
        Materialize.viaParquet(Multimodal.imageAHash(corpus), "s100_ahash")
      }
      val n = time("imageNearDupPairs hamming<=6") {
        Multimodal.imageNearDupPairs(hashes, maxHamming = 6).count()
      }
      println(s"[scale100] image near-dup pairs=$n")
    }

    if (which("r13")) {
      // the remaining round-13 registrations at 100× that have sf10
      // inputs (documents), run verbatim — the cdc-probe pattern: audio
      // dedup mirrors the image tier's shape (linear decode+hash then
      // Σf² join), bpe_apply is one codegen'd expression pass + a hash
      // aggregate — ~linear expected
      Seq("q_audio_dedup", "q_bpe_apply").foreach { name =>
        val fn = SparkEntry.queries(name)
        time(s"$name @sf0.1")(
          fn(spark, src).write.format("noop").mode("overwrite").save())
        time(s"$name @sf10 (100x)")(
          fn(spark, Sf10Dir).write.format("noop").mode("overwrite").save())
      }
    }

    if (which("imirecall")) {
      // round-13 (r12 verdict ask #4): the IMI assignment curve at 100×.
      // Reference = EXACT cos ≥ 0.9 pairs for a deterministic 1/1009
      // probe slice of the 200k clustered corpus (198 probes × 200k
      // dots — the same sampled-oracle trick as the 10× DuckDB gate,
      // Spark-side only because DuckDB has no business at 1.3e7 dots
      // when the engine under test can produce the reference itself).
      // Recall(nAssign) = |imiPairs∩slice| / |exact slice|.
      val emb = spark.read.parquet(s"$Sf10Dir/embeddings.parquet")
      val (corpusRaw, nC) = PipelineQueries.clusteredEmbeddings(emb)
      val corpus = Materialize.viaParquet(corpusRaw, "s100_imicorpus")
      println(s"[scale100] clustered corpus: ${corpus.count()} vecs, nC=$nC")
      val mod = 1009
      val probes = corpus.filter(col("vec_id") % mod === 0)
        .select(col("vec_id").as("pid"), col("embedding").as("pvec"))
      val exactSlice = time("exact sliced cos>=0.9 reference") {
        val scored = corpus.join(broadcast(probes), col("vec_id") =!= col("pid"))
          .select(least(col("pid"), col("vec_id")).as("id_a"),
            greatest(col("pid"), col("vec_id")).as("id_b"),
            graft.plans.GraftExtensions.graftCosine(spark,
              col("pvec"), col("embedding")).as("cos"))
          .filter(round(col("cos"), 4) >= 0.9)
          .select("id_a", "id_b").distinct()
        Materialize.viaParquet(scored, "s100_exactslice")
      }
      val nExact = exactSlice.count()
      println(s"[scale100] exact sliced pairs=$nExact")
      Seq(1, 2, 3).foreach { na =>
        val t0 = System.nanoTime()
        val imi = Materialize.viaParquet(
          Similarity.imiPairs(corpus, "vec_id", "embedding",
              nAssign = na, minCos = 0.9)
            .select("id_a", "id_b"), s"s100_imi$na")
        val wall = (System.nanoTime() - t0) / 1e9
        val total = imi.count()
        val sliceHit = imi
          .filter(col("id_a") % mod === 0 || col("id_b") % mod === 0)
          .join(exactSlice, Seq("id_a", "id_b"), "left_semi").count()
        println(f"[scale100] imi nAssign=$na wall=$wall%.1f s pairs=$total " +
          f"slice_recall=${if (nExact == 0) 1.0 else sliceHit.toDouble / nExact}%.5f " +
          s"($sliceHit/$nExact)")
      }
    }

    if (which("facade100")) {
      // round 14: the auto-switching facades at 100× — the whole point
      // of the switchover rule is that it fires HERE, where the gate
      // corpora never reach it. 500k docs → chooseNearDupTier must pick
      // minhash banding (past the 10⁵ simhash regime); 200k vectors →
      // chooseCosineTier must pick IMI. Walls recorded for SCALE.md.
      val docs = spark.read.parquet(s"$Sf10Dir/documents.parquet")
        .select("doc_id", "text")
      val nDocs = docs.count()
      val tTier = Dedup.chooseNearDupTier(nDocs, 0.9)
      println(s"[scale100] text facade: n=$nDocs tier=$tTier")
      require(tTier == Dedup.NearDupTier.MinHashBanding, s"expected banding, got $tTier")
      time("text facade (nearDupPairs 0.9, 500k docs)") {
        println(s"[scale100]   pairs=" +
          Dedup.nearDupPairs(docs, "doc_id", "text", minJaccard = 0.9,
            nDocsHint = Some(nDocs)).count())
      }
      val emb = spark.read.parquet(s"$Sf10Dir/embeddings.parquet")
      val (corpusRaw, _) = PipelineQueries.clusteredEmbeddings(emb)
      val corpus = Materialize.viaParquet(corpusRaw, "s100_facadecorpus")
      val nVecs = corpus.count()
      val vTier = graft.operators.Similarity.chooseCosineTier(nVecs, 0.9)
      // round 15: the rule now also picks the OPERATING POINT — at 200k
      // vectors the default 0.99 recall floor must escalate nAssign 2→3
      // (measured 0.9888 vs 0.9982 cross-engine, SCALE.md r14)
      val na = graft.operators.Similarity.chooseImiNAssign(nVecs)
      println(s"[scale100] vector facade: n=$nVecs tier=$vTier nAssign=$na")
      require(vTier == graft.operators.Similarity.CosineTier.Imi, s"expected Imi, got $vTier")
      require(na == 3, s"default floor must escalate to nAssign=3 at 100x, got $na")
      time("vector facade (cosinePairsAuto 0.9, 200k vecs, floor 0.99 -> nAssign 3)") {
        println(s"[scale100]   pairs=" +
          graft.operators.Similarity.cosinePairsAuto(corpus, "vec_id",
            "embedding", minCos = 0.9, nDocsHint = Some(nVecs)).count())
      }
      time("vector facade (floor 0.98 -> nAssign 2, the r14 operating point)") {
        println(s"[scale100]   pairs=" +
          graft.operators.Similarity.cosinePairsAuto(corpus, "vec_id",
            "embedding", minCos = 0.9, nDocsHint = Some(nVecs),
            imiRecallFloor = 0.98).count())
      }
    }

    if (which("imidump")) {
      // round 14 (r13 verdict ask #4 follow-up): dump the SLICED IMI
      // pair set at a given nAssign so DuckDB can anti-join it against
      // the exact sliced enumeration — extending the cross-engine recall
      // measurement past the registered nAssign=2 operating point. The
      // nAssign=2 point itself is gated by the real SampledQueries
      // recipe (SPARK_GRAFT_SLICE_MOD=1009 Verify run, see SCALE.md).
      val na = args.drop(1).headOption.map(_.toInt).getOrElse(3)
      val emb = spark.read.parquet(s"$Sf10Dir/embeddings.parquet")
      val (corpusRaw, _) = PipelineQueries.clusteredEmbeddings(emb)
      val corpus = Materialize.viaParquet(corpusRaw, "s100_imicorpus_d")
      val out = s"/tmp/graft_sf10_imi$na"
      time(s"imi nAssign=$na sliced pair dump") {
        Similarity.imiPairs(corpus, "vec_id", "embedding",
            nAssign = na, minCos = 0.9)
          .filter(col("id_a") % 1009 === 0)
          .select("id_a", "id_b")
          .coalesce(1).write.mode("overwrite").parquet(out)
      }
      println(s"[scale100] wrote $out")
    }

    if (which("ann")) {
      val emb = spark.read.parquet(s"$Sf10Dir/embeddings.parquet")
      // ONE quadratic pass, every cut's candidate count at once
      val hist = time("ann est-cos histogram (200k vecs)") {
        Similarity.sketchEstHistogram(emb, "vec_id", "embedding", binWidth = 0.05)
          .filter(col("bin") >= 0.0).orderBy(col("bin").desc).collect()
      }
      var cum = 0L
      hist.foreach { r =>
        cum += r.getLong(1)
        println(f"[scale100] est_cos>=${r.getDouble(0)}%.2f candidates=$cum%,d")
      }
      // the registered query at raised cuts: top-100 must be identical
      val tops = Seq(0.55, 0.45).map { cut =>
        val rows = time(f"q_embed_ann top-100 minEstCos=$cut%.2f") {
          Similarity.annPairs(emb, "vec_id", "embedding",
              minEstCos = cut, minCos = 0.45)
            .orderBy(col("cos_sim").desc, col("id_a"), col("id_b"))
            .limit(100).collect()
        }
        println(f"[scale100] cut=$cut%.2f top100_boundary_cos=${rows.last.getDouble(2)}%.4f")
        cut -> rows.map(r => (r.getLong(0), r.getLong(1))).toSeq
      }
      println(s"[scale100] top100 identical across cuts: ${tops.map(_._2).distinct.size == 1}")
    }

    if (which("cdc")) {
      // the round-12 CDC/MV/layout tier at 100× (registered queries run
      // verbatim against the sf10 orders replica set): each is one or two
      // key-hash exchanges over the fact, so the expectation is ~linear
      // wall — this probe is the evidence
      Seq("q_change_feed", "q_incr_agg", "q_partition_overwrite",
          "q_csv_ingest", "q_orc_roundtrip").foreach { name =>
        val fn = SparkEntry.queries(name)
        time(s"$name @sf0.1")(
          fn(spark, src).write.format("noop").mode("overwrite").save())
        time(s"$name @sf10 (100x)")(
          fn(spark, Sf10Dir).write.format("noop").mode("overwrite").save())
      }
    }
    spark.stop()
  }
}

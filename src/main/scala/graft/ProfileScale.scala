package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scale rehearsal (SCALE.md): synthesize a 10× corpus ("sf1") from sf0.1
 * and time the dedup/ANN queries at both scales. The scale-up preserves
 * per-replica near-dup structure without creating cross-replica dups:
 * documents get a per-replica token namespace (disjoint shingle spaces),
 * embeddings get a per-replica component rotation (same norm/distribution,
 * decorrelated). Not part of the driver contract.
 */
object ProfileScale {
  val Sf1Dir = "/tmp/graft_sf1"

  private[graft] def run(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"

    if (!new java.io.File(s"$Sf1Dir/embeddings.parquet").exists()) {
      val docs = spark.read.parquet(s"$src/documents.parquet")
      (0 until 10).map { r =>
        docs.withColumn("doc_id", col("doc_id") + lit(r * 10000000L))
          .withColumn("text",
            if (r == 0) col("text")
            else concat_ws(" ", transform(split(col("text"), " +"),
              t => concat(t, lit(s"_$r")))))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$Sf1Dir/documents.parquet")
      val emb = spark.read.parquet(s"$src/embeddings.parquet")
      (0 until 10).map { r =>
        emb.withColumn("vec_id", col("vec_id") + lit(r * 10000000L))
          .withColumn("embedding",
            if (r == 0) col("embedding")
            else concat(slice(col("embedding"), r + 1, 64 - r), slice(col("embedding"), 1, r)))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$Sf1Dir/embeddings.parquet")
      println(s"[scale] wrote $Sf1Dir")
    }
    if (!new java.io.File(s"$Sf1Dir/events.parquet").exists()) {
      // events: 10 replicas with disjoint user/event id spaces — per-user
      // timelines are preserved, the user population grows 10× (how an
      // event table actually scales). ts round-trips as raw nanos longs.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = spark.read.parquet(s"$src/events.parquet")
      (0 until 10).map { r =>
        ev.withColumn("event_id", col("event_id") + lit(r * 100000000L))
          .withColumn("user_id", col("user_id") + lit(r * 1000000L))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$Sf1Dir/events.parquet")
      println(s"[scale] wrote $Sf1Dir/events.parquet")
    }

    if (!new java.io.File(s"$Sf1Dir/lineitem.parquet").exists()) {
      // lineitem/orders: 10 replicas with disjoint orderkey/custkey spaces
      // — per-order line groups are preserved, the order population grows
      // 10× (how a fact pair actually scales)
      val li = spark.read.parquet(s"$src/lineitem.parquet")
      (0 until 10).map { r =>
        li.withColumn("l_orderkey", col("l_orderkey") + lit(r * 100000000L))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$Sf1Dir/lineitem.parquet")
      val ord = spark.read.parquet(s"$src/orders.parquet")
      (0 until 10).map { r =>
        ord.withColumn("o_orderkey", col("o_orderkey") + lit(r * 100000000L))
          .withColumn("o_custkey", col("o_custkey") + lit(r * 1000000L))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$Sf1Dir/orders.parquet")
      println(s"[scale] wrote $Sf1Dir lineitem+orders")
    }

    if (!new java.io.File(s"$Sf1Dir/customer.parquet").exists()) {
      // customer scales with the fact side (disjoint custkey spaces);
      // nation/region are DIMENSIONS — they do not grow with the corpus,
      // so they are copied as-is (exactly the 100 TB shape: a 25-row dim
      // against a 10× fact)
      val cust = spark.read.parquet(s"$src/customer.parquet")
      (0 until 10).map { r =>
        cust.withColumn("c_custkey", col("c_custkey") + lit(r * 1000000L))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$Sf1Dir/customer.parquet")
      Seq("nation", "region").foreach { t =>
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode("overwrite").parquet(s"$Sf1Dir/$t.parquet")
      }
      println(s"[scale] wrote $Sf1Dir customer+dims")
    }
    // supplier/part scale with SF in TPC-H; replicas with disjoint key
    // spaces (lineitem's l_suppkey/l_partkey still reference replica 0 —
    // fine for ORACLE-PARITY runs, where both engines see the same data).
    // Each table guards on ITS OWN artifact (r12 review: a crash between
    // the two writes must not leave part.parquet permanently missing).
    if (!new java.io.File(s"$Sf1Dir/supplier.parquet").exists()) {
      val sup = spark.read.parquet(s"$src/supplier.parquet")
      (0 until 10).map { r =>
        sup.withColumn("s_suppkey", col("s_suppkey") + lit(r * 1000000L))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$Sf1Dir/supplier.parquet")
      println(s"[scale] wrote $Sf1Dir/supplier.parquet")
    }
    if (!new java.io.File(s"$Sf1Dir/part.parquet").exists()) {
      val part = spark.read.parquet(s"$src/part.parquet")
      (0 until 10).map { r =>
        part.withColumn("p_partkey", col("p_partkey") + lit(r * 1000000L))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$Sf1Dir/part.parquet")
      println(s"[scale] wrote $Sf1Dir/part.parquet")
    }

    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_dedup_exact", "q_dedup_jaccard", "q_dedup_clusters", "q_dedup_prefix",
        "q_dedup_minhash", "q_dedup_simhash", "q_embed_ann", "q_embed_ivf",
        "q_decontam", "q_sample_stratified",
        "q_dedup_spans", "q_dedup_incremental", "q_pack_sequences",
        "q_quality_rep", "q_embed_quantize",
        "q_dedup_semantic", "q_knn_classify", "q_pii_redact",
        "q_events_sessionize", "q_events_funnel", "q_events_transitions",
        "q_dedup_hybrid", "q_quality_filter", "q_events_retention",
        "q_asof_forward", "q_embed_pq", "q_embed_pq_topk",
        "q_token_pmi", "q_pipeline_e2e", "q_embed_outliers")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      Seq("sf0.1" -> src, "sf1" -> Sf1Dir).foreach { case (tag, dir) =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"[scale] $name%-22s $tag%-6s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
    spark.stop()
  }
}

package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ingest dedup == batch exact dedup on a doubled corpus: the
  * streamed survivor count equals the number of distinct texts, and no
  * content hash survives twice. */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming content dedup drains to the batch exact-dedup result") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .select("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("graft-sdd").toString
    // simulate a crawl re-delivering the corpus: originals + shifted ids
    docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 100000L))
      .write.parquet(s"$base/in")
    val schema = spark.read.parquet(s"$base/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$base/in")
      // event time derived so a doc and its redelivery share a timestamp
      // inside the horizon
      .withColumn("ts", timestamp_micros(lit(1700000000000000L) + pmod(col("doc_id"), lit(100000L)) * 1000L))
    val q = Streams.runToMemory(
      Streams.contentDedupStream(stream, "ts", "text", watermark = "1 hour"), "sdd")
    try {
      val got = spark.table("sdd")
      assert(got.count() == docs.select("text").distinct().count())
      // no text survives twice
      assert(got.groupBy(sha2(col("text"), 256)).count().filter(col("count") > 1).count() == 0)
    } finally q.stop()
  }

  test("streaming image dedup flags noisy twins against the standing corpus") {
    import graft.operators.Multimodal
    // standing corpus: base images of docs 0..99; arriving batch: noisy
    // TWINS of every 7th doc (perceptual dups) + fresh images of docs
    // 300..339 (unseen — a range verified collision-free against the
    // corpus under the fixture formula, so none may flag)
    val ids = (0L until 100L).toDF("doc_id")
    val corpus = Multimodal.attachPngCorpus(ids, noisyEvery = 0)
    val twins = Multimodal.attachPngCorpus(
        ids.filter(col("doc_id") % 7 === 0), noisyEvery = 1)
      .filter(col("doc_id") >= 1000000L) // keep only the noisy twins
    val fresh = Multimodal.attachPngCorpus(
      (300L until 340L).toDF("doc_id"), noisyEvery = 0)
    val base = java.nio.file.Files.createTempDirectory("graft-imgdd").toString
    twins.unionByName(fresh).write.parquet(s"$base/in")
    val schema = spark.read.parquet(s"$base/in").schema
    val q = Streams.imageDedupSink(
      spark.readStream.schema(schema).parquet(s"$base/in"),
      corpus, s"$base/out", s"$base/ckpt")
    try q.processAllAvailable() finally q.stop()
    val out = spark.read.parquet(s"$base/out")
    assert(out.count() == 15 + 40) // 15 twins (0,7,...,98) + 40 fresh
    val dups = out.filter(col("is_dup") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
    // every twin flags, pointing at ITS base image, within tiny hamming
    assert(dups.map(_._1).sorted.toSeq ==
      (0L until 100L by 7L).map(_ + 1000000L).sorted.toSeq)
    assert(dups.forall { case (id, dupOf, hm) => dupOf == id - 1000000L && hm <= 3 },
      s"twins must resolve to their base: ${dups.toSeq}")
    // fresh images never flag
    assert(out.filter(col("id") >= 300L && col("id") < 340L)
      .filter(col("is_dup") === 1).count() == 0)
  }

  // round 14: the generalized perceptualDedupSink drives audio and video
  // through the SAME machinery; each spec checks the stream against a
  // driver-computed exact reference (best corpus neighbor by (hamming,
  // id) from the same hasher), so no fixture collision-range assumption
  // is baked in — whatever the true neighbor structure is, the sink must
  // reproduce it.
  // Round 15 (Δ×Δ): within one micro-batch the standing side is the
  // corpus PLUS every lower-id arrival (the least-id-canonical
  // convention) — the reference mirrors the sink's full contract, so
  // intra-arrival near-dups are part of the exact expectation, not an
  // excluded case.
  private def bestNeighborReference(arriving: Map[Long, Long],
      corpus: Map[Long, Long], maxHamming: Int): Map[Long, Option[(Long, Int)]] =
    arriving.map { case (id, h) =>
      val standing = corpus ++ arriving.filter { case (aid, _) => aid < id }
      val cands = standing.toSeq
        .map { case (nbr, nh) => (nbr, java.lang.Long.bitCount(h ^ nh)) }
        .filter(_._2 <= maxHamming)
      id -> (if (cands.isEmpty) None
             else Some(cands.minBy { case (nbr, hm) => (hm, nbr) })
               .map { case (nbr, hm) => (nbr, hm) })
    }

  private def hashMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def runSinkAndCheck(kind: String,
      corpus: org.apache.spark.sql.DataFrame,
      arriving: org.apache.spark.sql.DataFrame,
      hasher: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      mkSink: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        String, String) => org.apache.spark.sql.streaming.StreamingQuery,
      maxHamming: Int): Unit = {
    val base = java.nio.file.Files.createTempDirectory(s"graft-${kind}dd").toString
    arriving.write.parquet(s"$base/in")
    val schema = spark.read.parquet(s"$base/in").schema
    val q = mkSink(spark.readStream.schema(schema).parquet(s"$base/in"),
      corpus, s"$base/out", s"$base/ckpt")
    try q.processAllAvailable() finally q.stop()
    val want = bestNeighborReference(
      hashMap(hasher(arriving)), hashMap(hasher(corpus)), maxHamming)
    val got = spark.read.parquet(s"$base/out").collect().map { r =>
      r.getLong(0) -> (if (r.getInt(1) == 1) Some((r.getLong(2), r.getInt(3)))
                       else None)
    }.toMap
    assert(got.keySet == want.keySet, s"$kind: id sets differ")
    want.foreach { case (id, w) =>
      assert(got(id) == w, s"$kind id=$id: got ${got(id)} want $w")
    }
    // the fixture must actually exercise both outcomes
    assert(want.values.exists(_.isDefined), s"$kind: no dup in fixture")
    assert(want.values.exists(_.isEmpty), s"$kind: no non-dup in fixture")
  }

  test("streaming audio dedup matches the exact best-neighbor reference") {
    import graft.operators.Multimodal
    val ids = (0L until 80L).toDF("doc_id")
    val corpus = Multimodal.attachWavCorpus(ids, noisyEvery = 0)
    val arriving = Multimodal.attachWavCorpus(
        ids.filter(col("doc_id") % 7 === 0), noisyEvery = 1)
      .filter(col("doc_id") >= 1000000L) // noisy twins of every 7th doc
      .unionByName(Multimodal.attachWavCorpus(
        (500L until 520L).toDF("doc_id"), noisyEvery = 0))
    runSinkAndCheck("audio", corpus, arriving,
      d => Multimodal.audioEnergyHash(d),
      (s, c, o, ck) => Streams.audioDedupSink(s, c, o, ck), maxHamming = 6)
  }

  test("perceptual sink flags twins split ACROSS micro-batches (round 15)") {
    import graft.operators.Multimodal
    // corpus: bases 0..99. Batch 1 delivers the BASE image of doc 300
    // (collision-free vs the corpus — must pass). Batch 2 delivers its
    // noisy twin 1000300 — under the r14 corpus-only contract it passed
    // silently; the Δ×Δ standing table must flag it with dup_of = 300.
    // Batch 2 also carries a SAME-BATCH twin pair (301, 1000301): the
    // higher id flags against the lower, the lower passes.
    val corpus = Multimodal.attachPngCorpus((0L until 100L).toDF("doc_id"),
      noisyEvery = 0)
    val b1 = Multimodal.attachPngCorpus(Seq(300L).toDF("doc_id"), noisyEvery = 0)
    val twinOf = (ids: Seq[Long]) => Multimodal.attachPngCorpus(
        ids.toDF("doc_id"), noisyEvery = 1)
      .filter(col("doc_id") >= 1000000L)
    val b2 = twinOf(Seq(300L))
      .unionByName(Multimodal.attachPngCorpus(Seq(301L).toDF("doc_id"), noisyEvery = 0))
      .unionByName(twinOf(Seq(301L)))
    val base = java.nio.file.Files.createTempDirectory("graft-xbatch").toString
    b1.coalesce(1).write.parquet(s"$base/in/f0")
    b2.coalesce(1).write.parquet(s"$base/in/f1")
    val schema = spark.read.parquet(s"$base/in/f0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/in/*")
    val q = Streams.imageDedupSink(stream, corpus, s"$base/out", s"$base/ckpt")
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(s"$base/out")
      .select("id", "is_dup", "dup_of").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
      .toMap
    assert(got.keySet == Set(300L, 1000300L, 301L, 1000301L))
    assert(got(300L) == ((0, None)), "first copy (batch 1) must pass")
    assert(got(1000300L) == ((1, Some(300L))),
      "the cross-batch twin must flag with dup_of = the EARLIER ARRIVAL")
    assert(got(301L) == ((0, None)), "same-batch lower id is canonical")
    assert(got(1000301L) == ((1, Some(301L))),
      "the same-batch twin's higher id must flag against the lower")
  }

  test("semantic sink flags twins split ACROSS micro-batches (round 15)") {
    // corpus: 5 planted clusters. Batch 1 delivers a vector FAR from the
    // corpus (id 9000 — must pass); batch 2 its near-copy (id 9001 —
    // must flag with dup_of = 9000) plus a same-batch twin pair
    // (9100, 9101) also far from the corpus: 9101 flags against 9100.
    val rnd = new scala.util.Random(47)
    val centers = Seq.fill(5)(Array.fill(32)(rnd.nextGaussian().toFloat))
    val corpus = for (c <- 0 until 5; i <- 0 until 18) yield {
      val v = centers(c).map(x => x + 0.15f * rnd.nextGaussian().toFloat)
      ((c * 100 + i).toLong, v.toSeq)
    }
    val far1 = Array.fill(32)(rnd.nextGaussian().toFloat * 5f)
    val far2 = Array.fill(32)(rnd.nextGaussian().toFloat * 5f)
    val b1 = Seq((9000L, far1.toSeq))
    val b2 = Seq(
      (9001L, far1.map(x => x + 0.01f * rnd.nextGaussian().toFloat).toSeq),
      (9100L, far2.toSeq),
      (9101L, far2.map(x => x + 0.01f * rnd.nextGaussian().toFloat).toSeq))
    val base = java.nio.file.Files.createTempDirectory("graft-xbsem").toString
    b1.toDF("vec_id", "embedding").coalesce(1).write.parquet(s"$base/in/f0")
    b2.toDF("vec_id", "embedding").coalesce(1).write.parquet(s"$base/in/f1")
    val schema = spark.read.parquet(s"$base/in/f0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/in/*")
    val q = Streams.semanticDedupSink(stream, corpus.toDF("vec_id", "embedding"),
      s"$base/out", s"$base/ckpt", "vec_id", "embedding", minCos = 0.9)
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(s"$base/out")
      .select("id", "is_dup", "dup_of").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
      .toMap
    assert(got.keySet == Set(9000L, 9001L, 9100L, 9101L))
    assert(got(9000L) == ((0, None)), "first copy (batch 1) must pass")
    assert(got(9001L)._1 == 1 && got(9001L)._2 == Some(9000L),
      "the cross-batch twin must flag with dup_of = the EARLIER ARRIVAL")
    assert(got(9100L) == ((0, None)), "same-batch lower id is canonical")
    assert(got(9101L)._1 == 1 && got(9101L)._2 == Some(9100L),
      "the same-batch twin's higher id must flag against the lower")
  }

  test("a crashed partial seed is re-seeded on restart (round 16: _SEEDED marker)") {
    import graft.operators.Multimodal
    val corpus = Multimodal.attachPngCorpus((0L until 100L).toDF("doc_id"),
      noisyEvery = 0)
    val base = java.nio.file.Files.createTempDirectory("graft-seedcrash").toString
    // simulate a crash mid-seed: HALF the corpus hashes land, no _SEEDED
    // marker. Under the old directory-existence gate the restart treated
    // this as complete and the missing half never flagged anything.
    graft.operators.Multimodal.imageAHash(
        corpus.filter(col("doc_id") >= 50L), "doc_id", "media")
      .select(col("doc_id").as("nbr"), col("ahash").as("nbr_hash"))
      .write.parquet(s"$base/out/_stream_hashes/batch=seed")
    // arriving: a noisy twin of doc 0 — its base hash is in the MISSING
    // half of the partial seed
    val twin = Multimodal.attachPngCorpus(Seq(0L).toDF("doc_id"), noisyEvery = 1)
      .filter(col("doc_id") >= 1000000L)
    twin.coalesce(1).write.parquet(s"$base/in")
    val schema = spark.read.parquet(s"$base/in").schema
    val q = Streams.imageDedupSink(
      spark.readStream.schema(schema).parquet(s"$base/in"),
      corpus, s"$base/out", s"$base/ckpt")
    try q.processAllAvailable() finally q.stop()
    assert(graft.sources.Fs.exists(s"$base/out/_stream_hashes/_SEEDED"))
    val got = spark.read.parquet(s"$base/out")
      .select("id", "is_dup", "dup_of").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(got == Seq((1000000L, 1, Some(0L))),
      s"the re-seeded sink must flag the twin of the once-missing base: $got")
  }

  test("standing stream-state compaction bounds subdir growth without changing flags (round 16)") {
    import graft.operators.Multimodal
    val corpus = Multimodal.attachPngCorpus((0L until 50L).toDF("doc_id"),
      noisyEvery = 0)
    val base = java.nio.file.Files.createTempDirectory("graft-compact").toString
    def png(ids: Seq[Long], noisy: Boolean) = {
      val df = Multimodal.attachPngCorpus(ids.toDF("doc_id"),
        noisyEvery = if (noisy) 1 else 0)
      if (noisy) df.filter(col("doc_id") >= 1000000L) else df
    }
    // four single-file micro-batches; compactEvery=2 folds after ids 1, 3
    png(Seq(300L), noisy = false).coalesce(1).write.parquet(s"$base/in/f0")
    png(Seq(300L), noisy = true).coalesce(1).write.parquet(s"$base/in/f1")
    png(Seq(310L), noisy = false).coalesce(1).write.parquet(s"$base/in/f2")
    png(Seq(310L), noisy = true).coalesce(1).write.parquet(s"$base/in/f3")
    val schema = spark.read.parquet(s"$base/in/f0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/in/*")
    val q = Streams.perceptualDedupSink(stream, corpus, s"$base/out",
      s"$base/ckpt", (d, i, m) => Multimodal.imageAHash(d, i, m),
      compactEvery = 2)
    try q.processAllAvailable() finally q.stop()
    // the standing dir is ONE folded subdir, not seed + 4 batch subdirs
    val subdirs = graft.sources.Fs.listDirs(s"$base/out/_stream_hashes")
      .map(_.getPath.getName).filter(_.startsWith("batch="))
    assert(subdirs == Seq("batch=c3"), s"standing subdirs not folded: $subdirs")
    // flags are what the uncompacted run produces: cross-batch twins
    // resolve to their earlier arrival, first copies pass
    val got = spark.read.parquet(s"$base/out")
      .select("id", "is_dup", "dup_of").collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(got(300L) == ((0, None)) && got(310L) == ((0, None)))
    assert(got(1000300L) == ((1, Some(300L))))
    assert(got(1000310L) == ((1, Some(310L))))
  }

  test("replayed compaction after a partial source sweep loses no standing rows (round 17)") {
    import graft.sources.Fs
    val dir = java.nio.file.Files.createTempDirectory("graft-cst").toString + "/state"
    def sub(tag: String, ids: Seq[Long]): Unit =
      ids.toDF("id").write.mode("overwrite").parquet(s"$dir/batch=$tag")
    sub("0", Seq(1L, 2L)); sub("1", Seq(3L)); sub("2", Seq(4L))
    Streams.compactStanding(spark, dir, 5L)
    assert(spark.read.parquet(dir).select("id").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L, 3L, 4L))
    // two more micro-batches land, then compaction at batch 7 runs:
    // fold completes (c7 has _SUCCESS), c5 is deleted — CRASH before
    // deleting batch=6 and batch=6b
    sub("6", Seq(5L)); sub("6b", Seq(6L))
    spark.read.parquet(s"$dir/batch=c5", s"$dir/batch=6", s"$dir/batch=6b")
      .distinct().coalesce(4).write.mode("overwrite").parquet(s"$dir/batch=c7")
    Fs.deleteRecursive(new org.apache.hadoop.fs.Path(s"$dir/batch=c5"))
    // foreachBatch replays batch 7: the completed fold must NOT re-run
    // from the two surviving sources (that would drop ids 1..4, which
    // now exist only in c7) — it only finishes the sweep
    Streams.compactStanding(spark, dir, 7L)
    assert(spark.read.parquet(dir).select("id").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L, 3L, 4L, 5L, 6L),
      "rows folded before the crash must survive the replayed compaction")
    assert(!Fs.isDirectory(s"$dir/batch=6") && !Fs.isDirectory(s"$dir/batch=6b"),
      "the replay must still finish deleting the swept sources")
    // a mid-FOLD crash (no _SUCCESS) re-folds from the intact sources
    sub("8", Seq(7L))
    Fs.writeUtf8(s"$dir/batch=c9/part-00000.parquet.crc", "torn")
    Streams.compactStanding(spark, dir, 9L)
    assert(spark.read.parquet(dir).select("id").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L))
  }

  test("semantic sink restart reloads the persisted quantizer across a corpus change (round 16)") {
    val rnd = new scala.util.Random(53)
    val centers = Seq.fill(5)(Array.fill(32)(rnd.nextGaussian().toFloat))
    val corpus1 = for (c <- 0 until 5; i <- 0 until 18) yield {
      val v = centers(c).map(x => x + 0.15f * rnd.nextGaussian().toFloat)
      ((c * 100 + i).toLong, v.toSeq)
    }
    val far = Array.fill(32)(rnd.nextGaussian().toFloat * 5f)
    val base = java.nio.file.Files.createTempDirectory("graft-restartsem").toString
    Seq((9000L, far.toSeq)).toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$base/in/f0")
    val schema = spark.read.parquet(s"$base/in/f0").schema
    def start(corpus: Seq[(Long, Seq[Float])]) = Streams.semanticDedupSink(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/in/*"),
      corpus.toDF("vec_id", "embedding"),
      s"$base/out", s"$base/ckpt", "vec_id", "embedding", minCos = 0.9)
    val q1 = start(corpus1)
    try q1.processAllAvailable() finally q1.stop()
    assert(graft.sources.Fs.exists(s"$base/out/_index_cents/_SAVED"))
    // the corpus CHANGES across the restart (new clusters appended) — a
    // retrained quantizer would shift the cell space under the standing
    // stream history; the persisted centroids keep 9000's persisted
    // cells collision-compatible with its arriving near-copy
    val extra = for (c <- 0 until 5; i <- 0 until 10) yield {
      val nc = Array.fill(32)(rnd.nextGaussian().toFloat)
      ((2000 + c * 100 + i).toLong,
        nc.map(x => x + 0.15f * rnd.nextGaussian().toFloat).toSeq)
    }
    Seq((9001L, far.map(x => x + 0.01f * rnd.nextGaussian().toFloat).toSeq))
      .toDF("vec_id", "embedding").coalesce(1).write.parquet(s"$base/in/f1")
    val q2 = start(corpus1 ++ extra)
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(s"$base/out")
      .select("id", "is_dup", "dup_of").collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(got(9000L) == ((0, None)), "the first copy (pre-restart) must pass")
    assert(got(9001L)._1 == 1 && got(9001L)._2 == Some(9000L),
      s"the cross-RESTART twin must flag against the pre-restart arrival: ${got(9001L)}")
  }

  test("streaming video dedup matches the exact best-neighbor reference") {
    import graft.operators.Multimodal
    val ids = (0L until 60L).toDF("doc_id")
    val corpus = Multimodal.attachVideoCorpus(ids, noisyEvery = 0)
    val arriving = Multimodal.attachVideoCorpus(
        ids.filter(col("doc_id") % 7 === 0), noisyEvery = 1)
      .filter(col("doc_id") >= 1000000L)
      .unionByName(Multimodal.attachVideoCorpus(
        (500L until 515L).toDF("doc_id"), noisyEvery = 0))
    runSinkAndCheck("video", corpus, arriving,
      d => Multimodal.videoAHash(d, nSample = 3),
      (s, c, o, ck) => Streams.videoDedupSink(s, c, o, ck), maxHamming = 6)
  }
}

/** CDC ingest: micro-batches MERGE into keyed generations; the current
  * table state always resolves to a fully-written generation (write-new,
  * mark-later — commit markers, round 14). */
class StreamingUpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming upsert sink merges micro-batches to latest-wins generations") {
    val base = java.nio.file.Files.createTempDirectory("graft-sus").toString
    // two update files → two micro-batches (maxFilesPerTrigger=1); the
    // version column makes the final state batch-order-independent
    (1L to 50L).map(k => (k, "a", 1L)).toDF("k", "payload", "v")
      .coalesce(1).write.parquet(s"$base/in/f0")
    (26L to 75L).map(k => (k, "b", 2L)).toDF("k", "payload", "v")
      .coalesce(1).write.parquet(s"$base/in/f1")
    val schema = spark.read.parquet(s"$base/in/f0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/in/*")
    val q = Streams.upsertSink(stream, s"$base/table", s"$base/ckpt",
      Seq("k"), "v", parts = 2)
    try q.processAllAvailable() finally q.stop()
    val cur = Streams.currentGeneration(s"$base/table")
    assert(cur.isDefined, "a committed generation must exist after the stream drains")
    val out = spark.read.parquet(cur.get)
      .select("k", "payload", "v").as[(Long, String, Long)].collect()
    assert(out.length == 75)
    val m = out.map(r => r._1 -> ((r._2, r._3))).toMap
    assert((1L to 25L).forall(k => m(k) == ("a", 1L)), "untouched keys keep batch-0 rows")
    assert((26L to 75L).forall(k => m(k) == ("b", 2L)), "overlapping keys take the v2 update")
    // two generations on disk, pointer at the later merge
    val gens = new java.io.File(s"$base/table").listFiles().map(_.getName).filter(_.startsWith("gen"))
    assert(gens.length == 2, s"expected 2 generations, got ${gens.toSeq}")
  }

  test("CDC tombstones delete keys; a later re-insert resurrects legitimately") {
    val base = java.nio.file.Files.createTempDirectory("graft-susd").toString
    // three micro-batches (maxFilesPerTrigger=1): base load, a
    // delete-bearing CDC batch, then a re-insert of one deleted key at a
    // HIGHER version — the tombstone must kill its keys, the re-insert
    // must win over the tombstone, and version-based latest-wins keeps
    // the final state batch-order-independent
    (1L to 50L).map(k => (k, "a", 1L, "u")).toDF("k", "payload", "v", "op")
      .coalesce(1).write.parquet(s"$base/in/f0")
    ((1L to 10L).map(k => (k, "x", 2L, "d")) ++ (41L to 60L).map(k => (k, "b", 2L, "u")))
      .toDF("k", "payload", "v", "op")
      .coalesce(1).write.parquet(s"$base/in/f1")
    Seq((5L, "c", 3L, "u")).toDF("k", "payload", "v", "op")
      .coalesce(1).write.parquet(s"$base/in/f2")
    val schema = spark.read.parquet(s"$base/in/f0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/in/*")
    val q = Streams.upsertSink(stream, s"$base/table", s"$base/ckpt",
      Seq("k"), "v", parts = 2, opCol = Some("op"))
    try q.processAllAvailable() finally q.stop()
    val cur = Streams.currentGeneration(s"$base/table")
    assert(cur.isDefined)
    val out = spark.read.parquet(cur.get)
    // op is transport metadata — the stored generation must not carry it
    // (a persisted tombstone would shadow later legitimate re-inserts)
    assert(!out.columns.contains("op"), "op column must not persist in the table")
    val m = out.select("k", "payload", "v").as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m.size == 51, s"expected 51 live keys, got ${m.size}")
    assert((6L to 10L).forall(k => !m.contains(k)), "tombstoned keys stay dead")
    assert((1L to 4L).forall(k => !m.contains(k)), "tombstoned keys stay dead")
    assert(m(5L) == ("c", 3L), "higher-version re-insert beats the tombstone")
    assert((11L to 40L).forall(k => m(k) == ("a", 1L)), "untouched keys survive")
    assert((41L to 60L).forall(k => m(k) == ("b", 2L)), "CDC upserts apply")
  }

  test("replay after a crash inside the commit window is an idempotent no-op") {
    val base = java.nio.file.Files.createTempDirectory("graft-susr").toString
    (1L to 50L).map(k => (k, "a", 1L)).toDF("k", "payload", "v")
      .coalesce(1).write.parquet(s"$base/in/f0")
    (26L to 75L).map(k => (k, "b", 2L)).toDF("k", "payload", "v")
      .coalesce(1).write.parquet(s"$base/in/f1")
    val schema = spark.read.parquet(s"$base/in/f0").schema
    def start(ckpt: String) = Streams.upsertSink(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$base/in/*"),
      s"$base/table", ckpt, Seq("k"), "v", parts = 2)
    val q = start(s"$base/ckpt")
    try q.processAllAvailable() finally q.stop()
    // simulate the crash window the r11 advice found: the batch's write
    // finished and its table commit marker landed, but the CHECKPOINT
    // commit was lost. A real crash restarts in a FRESH JVM, so the
    // checkpoint (minus the lost checkpoint-commit file) is copied to a
    // new path — Spark's same-JVM "multiple queries on one checkpoint"
    // guard would otherwise trip — and the restarted stream REPLAYS the
    // last batch, which now resolves currentGeneration == its own output
    // directory. Without the marker-guard the replayed upsertWrite reads
    // gen1 while overwriting gen1 and Spark kills the stream permanently.
    val src = java.nio.file.Paths.get(s"$base/ckpt")
    val dst = java.nio.file.Paths.get(s"$base/ckpt2")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(src).iterator().asScala.toSeq.sortBy(_.toString)
      .foreach { p =>
        val t = dst.resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t)
      }
    val commits = new java.io.File(s"$base/ckpt2/commits").listFiles()
      .filter(_.getName.forall(_.isDigit))
    val last = commits.maxBy(_.getName.toInt)
    assert(last.delete(), "test setup: failed to remove commit marker")
    // the Hadoop local FS shadows every file with a .name.crc checksum —
    // leave one behind and the replayed commit's rename fails on it
    new java.io.File(last.getParentFile, s".${last.getName}.crc").delete()
    val q2 = start(s"$base/ckpt2")
    try q2.processAllAvailable() finally q2.stop()
    val cur = Streams.currentGeneration(s"$base/table")
    val out = spark.read.parquet(cur.get)
      .select("k", "payload", "v").as[(Long, String, Long)].collect()
    assert(out.length == 75, "replayed batch must not change the table")
    val m = out.map(r => r._1 -> ((r._2, r._3))).toMap
    assert((1L to 25L).forall(k => m(k) == ("a", 1L)))
    assert((26L to 75L).forall(k => m(k) == ("b", 2L)))
  }
}

/** Generation lifecycle (round 12; commit markers round 14): every
  * [[Streams.upsertSink]] merge is a complete copy-on-write snapshot, so
  * old generations are time-travel targets and retention is directory
  * deletion — with the invariants that make it safe: the newest COMMITTED
  * generation is never vacuumed, and dangling generations newer than it
  * (a crashed batch's replay target) are kept. */
class GenerationLifecycleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def buildTable(base: String): Unit = {
    // three micro-batches → gen0..gen2: base load, tombstone+update, re-insert
    (1L to 50L).map(k => (k, "a", 1L, "u")).toDF("k", "payload", "v", "op")
      .coalesce(1).write.parquet(s"$base/in/f0")
    ((1L to 10L).map(k => (k, "x", 2L, "d")) ++ (41L to 60L).map(k => (k, "b", 2L, "u")))
      .toDF("k", "payload", "v", "op")
      .coalesce(1).write.parquet(s"$base/in/f1")
    Seq((5L, "c", 3L, "u")).toDF("k", "payload", "v", "op")
      .coalesce(1).write.parquet(s"$base/in/f2")
    val schema = spark.read.parquet(s"$base/in/f0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/in/*")
    val q = Streams.upsertSink(stream, s"$base/table", s"$base/ckpt",
      Seq("k"), "v", parts = 2, opCol = Some("op"))
    try q.processAllAvailable() finally q.stop()
  }

  test("time travel reads any generation as of its batch") {
    val base = java.nio.file.Files.createTempDirectory("graft-gen").toString
    buildTable(base)
    assert(Streams.listGenerations(s"$base/table").map(_._1) == Seq(0L, 1L, 2L))
    // gen0: the pre-delete state — tombstoned keys still alive
    val g0 = Streams.readGeneration(spark, s"$base/table", 0L)
      .select("k").as[Long].collect().toSet
    assert(g0 == (1L to 50L).toSet, "gen0 is the full base load")
    // gen1: deletes applied, re-insert not yet arrived
    val g1 = Streams.readGeneration(spark, s"$base/table", 1L)
      .select("k").as[Long].collect().toSet
    assert(!g1.contains(5L) && !g1.contains(10L) && g1.contains(60L))
    // gen2 is the current (newest committed) generation
    val cur = Streams.currentGeneration(s"$base/table").get
    assert(Streams.readGeneration(spark, s"$base/table", 2L).count() ==
      spark.read.parquet(cur).count())
    val err = intercept[IllegalArgumentException] {
      Streams.readGeneration(spark, s"$base/table", 9L)
    }
    assert(err.getMessage.contains("committed: 0, 1, 2"))
  }

  test("vacuum keeps the newest K committed generations") {
    val base = java.nio.file.Files.createTempDirectory("graft-vac").toString
    buildTable(base)
    val deleted = Streams.vacuumGenerations(s"$base/table", keepLast = 2)
    assert(deleted.map(p => p.substring(p.lastIndexOf('/') + 1)) == Seq("gen0"))
    assert(Streams.listGenerations(s"$base/table").map(_._1) == Seq(1L, 2L))
    // the table is still readable through read-side resolution
    val cur = Streams.currentGeneration(s"$base/table").get
    assert(spark.read.parquet(cur).count() == 51)
    // asking to keep more than exists is a no-op
    assert(Streams.vacuumGenerations(s"$base/table", keepLast = 5).isEmpty)
  }

  test("vacuum never deletes the current generation or newer replay targets") {
    val base = java.nio.file.Files.createTempDirectory("graft-vac2").toString
    buildTable(base)
    // simulate a crash inside gen2's commit window (data written, marker
    // lost) plus a later crashed batch that only made its directory:
    // committed = {0, 1}, current = gen1, dangling = {2, 3}
    val table = s"$base/table"
    assert(graft.sources.Fs.deleteIfExists(
      Streams.commitMarkerPath(table, 2L)), "test setup: marker removal")
    val g3 = new java.io.File(s"$table/gen3")
    assert(g3.mkdir())
    assert(Streams.currentGeneration(table).get.endsWith("gen1"))
    // keepLast=1 would by age alone delete gen0..gen2: the current
    // generation (gen1) and every dangling dir NEWER than it (gen2,
    // gen3 — replay targets) must survive
    val deleted = Streams.vacuumGenerations(table, keepLast = 1)
    assert(deleted.map(p => p.substring(p.lastIndexOf('/') + 1)) == Seq("gen0"))
    assert(Streams.listGenerations(table).map(_._1) == Seq(1L, 2L, 3L))
  }

  test("vacuum sweeps dangling directories older than the current generation") {
    val base = java.nio.file.Files.createTempDirectory("graft-vac3").toString
    buildTable(base)
    val table = s"$base/table"
    // gen1's marker lost long ago, but gen2 since committed: gen1 is a
    // superseded crash leftover — its batch was replayed into gen2 —
    // and must be swept even inside the keepLast window
    assert(graft.sources.Fs.deleteIfExists(Streams.commitMarkerPath(table, 1L)))
    val deleted = Streams.vacuumGenerations(table, keepLast = 1)
    assert(deleted.map(p => p.substring(p.lastIndexOf('/') + 1)).sorted == Seq("gen0", "gen1"))
    assert(Streams.listGenerations(table).map(_._1) == Seq(2L))
    assert(Streams.currentGeneration(table).get.endsWith("gen2"))
  }

  test("orphan-marker sweep never touches markers newer than maxCommitted (round 14)") {
    // the race the bound closes: a live sink commits gen N (dir first,
    // then marker) BETWEEN vacuum's directory snapshot and its marker
    // listing — the marker is visible, the dir snapshot is stale, and an
    // unbounded sweep would delete the fresh commit's marker, demoting a
    // committed generation to dangling (data loss at the next vacuum).
    // Simulated by the observable half: a marker with id > maxCommitted
    // and no dir in the snapshot must SURVIVE; a dirless marker with
    // id < maxCommitted is a true crashed-vacuum orphan and is swept.
    val base = java.nio.file.Files.createTempDirectory("graft-vac4").toString
    buildTable(base) // gens 0,1,2 committed
    val table = s"$base/table"
    // true orphan: gen0's dir deleted, marker left (vacuum crash window)
    assert(graft.sources.Fs.deleteRecursive(
      new org.apache.hadoop.fs.Path(s"$table/gen0")))
    // concurrent-commit stand-in: marker for gen9, no dir in the snapshot
    graft.sources.Fs.createMarker(Streams.commitMarkerPath(table, 9L), "race")
    Streams.vacuumGenerations(table, keepLast = 2)
    val markers = graft.sources.Fs.listFiles(s"$table/_commits")
      .map(_.getPath.getName).sorted
    assert(!markers.contains("gen0"), s"true orphan gen0 must be swept: $markers")
    assert(markers.contains("gen9"), s"fresh gen9 marker must survive: $markers")
    // cleanup the fake marker so later resolution in this dir stays sane
    assert(graft.sources.Fs.deleteIfExists(Streams.commitMarkerPath(table, 9L)))
  }
}

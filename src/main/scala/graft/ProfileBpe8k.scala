package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Bpe

/**
 * Round-14 tokenizer-scale BPE rehearsal (SCALE.md): the native
 * `graft_bpe_encode` expression exists for 10k–50k-rule tables, but the
 * largest oracle-gated table is ~100 rules — this measures the regime
 * the expression is FOR.
 *
 * Two corpora, both measured:
 *
 *   1. The real sf1 documents table (50 k docs). Its synthetic text has
 *      only ~310 distinct words, so BPE EXHAUSTS well short of 8 k rules
 *      — recorded honestly as the corpus-intrinsic cap (merge count is
 *      bounded by total characters across the distinct-word vocabulary,
 *      not by corpus rows).
 *   2. A rich-vocabulary corpus at the same row count: 50 k docs × 40
 *      words drawn deterministically from a 20 k-word pool (xxhash-mixed
 *      letters, word lengths 6–13), which supports ≥ 8k merges — the
 *      Heaps'-law shape of a real crawl, where vocabulary keeps growing.
 *
 * For each: learn (wall + pair-count JOB count — the batching economy),
 * then encode the full corpus with the native expression (wall), and pin
 * native-vs-fold parity by running [[Bpe.encodeTable]] on a
 * deterministic 500-doc slice and comparing row-for-row (the fold at
 * 8 k rules is ~170 staged passes — running it corpus-wide is exactly
 * what the native expression exists to avoid, so the parity slice is
 * how it stays checkable).
 */
object ProfileBpe8k {
  private def time[T](name: String)(f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    val s = (System.nanoTime() - t0) / 1e9
    System.err.println(f"[bpe8k] $name%-34s $s%8.2f s")
    (r, s)
  }

  private[graft] def run(args: Array[String]): Unit = {
    val numMerges = args.headOption.map(_.toInt).getOrElse(8192)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val real = spark.read.parquet("/tmp/graft_sf1/documents.parquet")
      .select(col("doc_id"), col("text"))
    // rich vocabulary: word w of doc d indexes a 20k pool; pool word i is
    // 6 + (i % 8) letters mixed from xxhash64 so no two pool words collide
    // often and pair statistics are spread (Heaps-law stand-in)
    // one nested HOF tree (word index → chars → join) instead of 40×13
    // chained scalar exprs — the flat form grew generated code past 64 KB
    val pool = 20000
    val rich = spark.range(0, 50000, 1, 32)
      .select(col("id").as("doc_id"),
        array_join(transform(sequence(lit(0), lit(39)), w => {
          val widx = pmod(xxhash64(col("id"), w), lit(pool))
          array_join(transform(
            sequence(lit(0), pmod(widx, lit(8)) + 5),
            c => chr(pmod(xxhash64(widx, c), lit(26)) + 97)), "")
        }), " ").as("text"))

    for ((tag, docs) <- Seq(("sf1-real", real), ("rich-20k-vocab", rich))) {
      val frozen = graft.operators.Materialize.viaParquet(docs, s"bpe8k_$tag")
      val n = frozen.count()
      // round 15: the AUTO learner — one distributed vocab pass, then the
      // size gate picks the in-process merge loop (both corpora's vocabs
      // are ~2-3 orders under the 2M-word gate). The r14 row for the same
      // rehearsal was the distributed loop: 1322 s / 3074 pair-count jobs
      // at 8192 rules; the table is bit-identical by the spec-pinned
      // tier-parity contract (batchSize 64 kept for a forced-distributed
      // re-run via maxLocalVocab = 0 if ever needed)
      val ((merges, tier), learnWall) = time(s"$tag learn (target $numMerges)")(
        Bpe.learnMergesAutoWithTier(frozen, "text", numMerges, batchSize = 64))
      System.err.println(
        f"[bpe8k] $tag%-16s rules=${merges.size} tier=$tier docs=$n")
      val nat = frozen.select(col("doc_id"),
        Bpe.encodeNative(spark, col("text"), merges).as("toks"))
      val (total, natWall) = time(s"$tag native encode (full corpus)")(
        nat.agg(sum(size(flatten(col("toks"))))).collect()(0).getLong(0))
      System.err.println(s"[bpe8k] $tag total tokens = $total")
      // parity slice: fold/staged encoder vs native, row-for-row
      val slice = frozen.filter(col("doc_id") % 101 === 0)
      val (_, foldWall) = time(s"$tag encodeTable (500-doc slice)") {
        val staged = Bpe.encodeTable(slice, "text", "toks", merges)
        val mismatches = staged.select(col("doc_id"), col("toks").as("fold"))
          .join(nat.withColumnRenamed("toks", "native"), "doc_id")
          .filter(col("fold") =!= col("native")).count()
        require(mismatches == 0, s"$tag: $mismatches parity mismatches")
        mismatches
      }
      System.err.println(
        f"[bpe8k] $tag learn=$learnWall%.1fs native=$natWall%.1fs " +
          f"foldSlice=$foldWall%.1fs parity=OK")
    }
    spark.stop()
  }
}

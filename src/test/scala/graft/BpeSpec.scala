package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE training against the hand-computed merge sequence of the paper's
  * own example corpus (Sennrich et al. 2016 §3.2 uses {low, lower,
  * newest, widest}); encode() must then reproduce the canonical
  * "lowest" → [low, est</w>] segmentation from merges learned WITHOUT
  * ever seeing "lowest". */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // corpus realizing word frequencies low×5 lower×2 newest×6 widest×3
  private def corpus = {
    val words =
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    // spread across a few docs so the vocab aggregate actually reduces
    words.grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
  }

  test("learnMerges reproduces the hand-computed merge table") {
    // pair counts round by round (ties break lexicographically):
    //   r0: (e,s)=9 ties (s,t),(t,</w>) → es
    //   r1: (es,t)=9 ties (t,</w>)      → est
    //   r2: (est,</w>)=9                → est</w>
    //   r3: (l,o)=7 ties (o,w)          → lo
    //   r4: (lo,w)=7                    → low
    val merges = Bpe.learnMerges(corpus, "text", numMerges = 5)
    assert(merges == Seq(
      (0, "e", "s"), (1, "es", "t"), (2, "est", Bpe.EndOfWord),
      (3, "l", "o"), (4, "lo", "w")))
  }

  test("encode segments an unseen word with the learned table") {
    val merges = Bpe.learnMerges(corpus, "text", numMerges = 5)
    val got = Seq("lowest low newest").toDF("text")
      .select(Bpe.encode(col("text"), merges).as("toks"))
      .collect()(0).getSeq[scala.collection.Seq[String]](0)
      .toList.map(_.toList)
    assert(got == List(
      Seq("low", "est" + Bpe.EndOfWord),           // unseen word, correct split
      Seq("low", Bpe.EndOfWord),                   // "low" fully merged, eow separate
      Seq("n", "e", "w", "est" + Bpe.EndOfWord)))  // n-e-w never merged (max was 6 < cutoff reached)
  }

  test("learns from the real documents fixture, deterministically") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet").select("text")
    val merges = Bpe.learnMerges(docs, "text", numMerges = 8)
    assert(merges.map(_._1) == (0 until 8))
    // every learned merge's parts are non-empty and the result re-derives
    // bit-identically (distributed argmax is deterministic on real text)
    assert(merges.forall { case (_, a, b) => a.nonEmpty && b.nonEmpty })
    assert(merges == Bpe.learnMerges(docs, "text", numMerges = 8))
  }

  test("training exhausts gracefully when no pairs remain") {
    val tiny = Seq("a a a").toDF("text") // single char + </w>: one possible merge
    val merges = Bpe.learnMerges(tiny, "text", numMerges = 10)
    assert(merges == Seq((0, "a", Bpe.EndOfWord)))
  }

  test("greedy left-to-right merge handles overlapping runs") {
    val df = Seq(("x")).toDF("w")
      .select(split(lit("aaaa"), "").as("chars"))
      .select(graft.operators.Bpe.mergePair(col("chars"), "a", "a").as("m"))
    assert(df.collect()(0).getSeq[String](0) == Seq("aa", "aa"))
  }

  test("non-ASCII words are trained on, not dropped (round-13 fix)") {
    // the r12 [^a-z0-9]+ split discarded every one of these words
    val multi = Seq.fill(4)("straße straße café niño")
      .toDF("text")
    val vocab = Bpe.wordVocab(multi, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab == Map("straße" -> 8L, "café" -> 4L, "niño" -> 4L))
    val merges = Bpe.learnMerges(multi, "text", numMerges = 3)
    assert(merges.nonEmpty)
    // the most frequent pair comes from "straße" (weight 8): merges must
    // carry non-ASCII characters through untouched
    assert(merges.exists { case (_, a, b) => (a + b).exists(_ > 127) })
  }

  test("batched merge selection yields the identical table in fewer jobs") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet").select("text")
    val (single, singleRounds) =
      Bpe.learnMergesWithRounds(docs, "text", numMerges = 12, batchSize = 1)
    val (batched, batchedRounds) =
      Bpe.learnMergesWithRounds(docs, "text", numMerges = 12, batchSize = 16)
    assert(batched == single, "batched table must equal the sequential table")
    assert(singleRounds == 12)
    assert(batchedRounds < 12,
      s"batching should cut pair-count jobs (got $batchedRounds rounds for 12 merges)")
  }

  test("batched == sequential on adversarial tiny corpora (collision paths)") {
    // small alphabets maximize shared-symbol and symbol-collision cases
    // (e.g. "ab"+"c" vs "a"+"bc" both spelling "abc")
    val corpora = Seq(
      "abc abc abc ab bc a b c abcabc",
      "aa aa ab ab ba ba aab aba bab bb",
      "xyz zyx xxyyzz xy yz zx xyzxyz xzy",
      "aaa aaaa aaaaa aa a",
      "deed deep peed pede deedeep")
    for (c <- corpora) {
      val df = Seq(c).toDF("text")
      val s = Bpe.learnMerges(df, "text", numMerges = 10, batchSize = 1)
      val b = Bpe.learnMerges(df, "text", numMerges = 10, batchSize = 8)
      assert(b == s, s"divergence on corpus '$c': batched=$b sequential=$s")
    }
  }

  test("native graft_bpe_encode equals the fold encoder (incl. unseen words)") {
    val merges = Bpe.learnMerges(corpus, "text", numMerges = 5)
    val in = Seq("lowest low newest", "wide widest lower", "straße café 東京")
      .toDF("text")
    def collectToks(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getSeq[scala.collection.Seq[String]](0).map(_.toList).toList).toList
    val fold = collectToks(in.select(Bpe.encode(col("text"), merges).as("t")))
    val native = collectToks(in.select(Bpe.encodeNative(spark, col("text"), merges).as("t")))
    assert(native == fold)
  }

  test("native encoder matches the fold on collision-prone corpora and tables") {
    // tables learned from small alphabets maximize merge-symbol
    // collisions ("ab"+"c" vs "a"+"bc" both spelling "abc") — the case
    // where the native min-rank loop must fall back to the literal
    // rank-order passes to stay bit-equal
    val corpora = Seq(
      "abc abc abc ab bc a b c abcabc",
      "aa aa ab ab ba ba aab aba bab bb",
      "deed deep peed pede deedeep",
      "aaa aaaa aaaaa aa a")
    for (c <- corpora) {
      val df = Seq(c).toDF("text")
      val merges = Bpe.learnMerges(df, "text", numMerges = 10)
      val probe = Seq(c, c.reverse, "aabbaabb abcabc deedpede").toDF("text")
      def collectToks(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(_.getSeq[scala.collection.Seq[String]](0).map(_.toList).toList).toList
      val fold = collectToks(probe.select(Bpe.encode(col("text"), merges).as("t")))
      val native = collectToks(probe.select(Bpe.encodeNative(spark, col("text"), merges).as("t")))
      assert(native == fold, s"divergence on corpus '$c'")
    }
  }

  test("native encoder handles a table far past the fold's codegen reach") {
    // 200+ learned rules from the real fixture: the single-projection
    // fold would nest 200 aggregate() folds (planner-hostile); the
    // native expression binds the table once — verify against the STAGED
    // fold encoder, which is exact at any size
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .select("text").limit(120)
    val merges = Bpe.learnMerges(docs, "text", numMerges = 200, batchSize = 32)
    // the 120-doc fixture slice exhausts its pair space around ~105 rules
    // — still far past what a single-projection fold could plan
    assert(merges.size >= 100)
    val probe = docs.limit(12)
    val staged = Bpe.encodeTable(probe, "text", "toks", merges, stageEvery = 40)
      .select(col("text"), col("toks"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[scala.collection.Seq[String]](1).map(_.toList).toList).toMap
    val native = probe
      .select(col("text"), Bpe.encodeNative(spark, col("text"), merges).as("toks"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[scala.collection.Seq[String]](1).map(_.toList).toList).toMap
    assert(native == staged)
    // and it's SQL-surfaced: registered function name resolves
    assert(spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_bpe_encode")))
  }

  test("native == staged fold on a LEARNED 512-rule table (rich vocabulary)") {
    // The fixture corpus caps at ~116 rules (310-word vocabulary); a
    // tokenizer-scale table needs a Heaps-law vocabulary. Same rich
    // generator as the SCALE.md bpe8k rehearsal at mini scale: 600 docs
    // x 30 words from a 1500-word xxhash pool — supports 512+ merges.
    // Parity on the LEARNED table (not a synthetic one) is the gate the
    // round-13 verdict asked for: collision structure of real learned
    // merges (e.g. transitive symbol reuse) is what synthetic tables
    // can miss. The 8192-rule rehearsal (ProfileBpe8k) pins the same
    // equality at full scale.
    val pool = 1500
    val rich = spark.range(0, 600, 1, 4)
      .select(col("id").as("doc_id"),
        array_join(transform(sequence(lit(0), lit(29)), w => {
          val widx = pmod(xxhash64(col("id"), w), lit(pool))
          array_join(transform(
            sequence(lit(0), pmod(widx, lit(8)) + 5),
            c => chr(pmod(xxhash64(widx, c), lit(26)) + 97)), "")
        }), " ").as("text"))
    val merges = Bpe.learnMerges(rich, "text", numMerges = 512, batchSize = 64)
    assert(merges.size == 512, s"rich mini-corpus exhausted at ${merges.size}")
    val probe = rich.filter(col("doc_id") % 7 === 0) // 86 docs
    val staged = Bpe.encodeTable(probe, "text", "toks", merges)
      .select(col("doc_id"), col("toks"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[scala.collection.Seq[String]](1).map(_.toList).toList).toMap
    val native = probe
      .select(col("doc_id"), Bpe.encodeNative(spark, col("text"), merges).as("toks"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[scala.collection.Seq[String]](1).map(_.toList).toList).toMap
    assert(native == staged)
    assert(native.nonEmpty && native.values.forall(_.nonEmpty))
  }

  test("auto learner picks the local tier and reproduces the hand table") {
    val (merges, tier) = Bpe.learnMergesAutoWithTier(corpus, "text", numMerges = 5)
    assert(tier == "local") // 9-word vocab, far under the gate
    assert(merges == Seq(
      (0, "e", "s"), (1, "es", "t"), (2, "est", Bpe.EndOfWord),
      (3, "l", "o"), (4, "lo", "w")))
  }

  test("local learner == distributed learner on the real documents fixture") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet").select("text")
    val distributed = Bpe.learnMerges(docs, "text", numMerges = 12)
    val (local, tier) = Bpe.learnMergesAutoWithTier(docs, "text", numMerges = 12)
    assert(tier == "local")
    assert(local == distributed,
      "local merge table must be bit-identical to the distributed learner's")
  }

  test("local == distributed on adversarial tiny corpora (tie/collision paths)") {
    val corpora = Seq(
      "abc abc abc ab bc a b c abcabc",
      "aa aa ab ab ba ba aab aba bab bb",
      "xyz zyx xxyyzz xy yz zx xyzxyz xzy",
      "aaa aaaa aaaaa aa a",
      "deed deep peed pede deedeep")
    for (c <- corpora) {
      val df = Seq(c).toDF("text")
      val d = Bpe.learnMerges(df, "text", numMerges = 10, batchSize = 1)
      val (l, tier) = Bpe.learnMergesAutoWithTier(df, "text", numMerges = 10)
      assert(tier == "local")
      assert(l == d, s"divergence on corpus '$c': local=$l distributed=$d")
    }
  }

  test("learner tier rule is pure; forcing the distributed tier agrees") {
    assert(Bpe.chooseBpeLearner(5, 10) == "local")
    assert(Bpe.chooseBpeLearner(10, 10) == "local") // gate is inclusive
    assert(Bpe.chooseBpeLearner(11, 10) == "distributed")
    assert(Bpe.chooseBpeLearner(20000) == "local") // r14 rehearsal vocab
    assert(Bpe.chooseBpeLearner(100L * 1000 * 1000) == "distributed") // crawl-scale
    // maxLocalVocab = 0 forces the distributed branch through the facade;
    // the table must not depend on the tier taken
    val (dist, tierD) =
      Bpe.learnMergesAutoWithTier(corpus, "text", numMerges = 5, maxLocalVocab = 0)
    assert(tierD == "distributed")
    assert(dist == Bpe.learnMergesAuto(corpus, "text", numMerges = 5))
  }

  test("local tie-break is UTF-8 byte order, matching Spark string order") {
    // U+FF41 (fullwidth a, BMP: EF BD 81) vs U+10428 (Deseret long i,
    // astral: F0 90 90 A8): UTF-8 bytes rank the BMP char FIRST, Java's
    // UTF-16 compareTo ranks the astral char first (surrogate D801 <
    // FF41). Both pairs tie at count 1, so the tie-break decides rank 0 —
    // a UTF-16 comparator in the local learner would flip the table.
    val df = Seq("ａ 𐐨").toDF("text")
    val distributed = Bpe.learnMerges(df, "text", numMerges = 2)
    val (local, tier) = Bpe.learnMergesAutoWithTier(df, "text", numMerges = 2)
    assert(tier == "local")
    assert(distributed == Seq(
      (0, "ａ", Bpe.EndOfWord), (1, "𐐨", Bpe.EndOfWord)))
    assert(local == distributed)
  }

  test("local learner exhausts gracefully like the distributed one") {
    val tiny = Seq("a a a").toDF("text")
    val (local, tier) = Bpe.learnMergesAutoWithTier(tiny, "text", numMerges = 10)
    assert(tier == "local")
    assert(local == Seq((0, "a", Bpe.EndOfWord)))
  }

  test("encodeTable emits the same column order on both branches") {
    // multi-stage keyed path (stageEvery=2 over 5 merges, multi-column
    // input) vs single-stage path: round-14 advice — the join-back used
    // to append outCol last while withColumn replaced it in place
    val merges = Bpe.learnMerges(corpus, "text", numMerges = 5)
    val in = Seq(("lowest", 1, "x"), ("widest", 2, "y"))
      .toDF("text", "k", "toks") // pre-existing outCol in the MIDDLE? no — put it mid-schema
      .select(col("text"), col("toks"), col("k"))
    val multi = Bpe.encodeTable(in, "text", "toks", merges, stageEvery = 2)
    val single = Bpe.encodeTable(in, "text", "toks", merges, stageEvery = 100)
    assert(multi.columns.toSeq == single.columns.toSeq)
    assert(multi.columns.toSeq == Seq("text", "toks", "k"),
      "outCol must be replaced IN PLACE when the input already has it")
    // and without a pre-existing outCol: appended last on both branches
    val fresh = in.select(col("text"), col("k"))
    assert(Bpe.encodeTable(fresh, "text", "toks", merges, stageEvery = 2).columns.toSeq
      == Bpe.encodeTable(fresh, "text", "toks", merges, stageEvery = 100).columns.toSeq)
  }

  test("encodeTable staged encoding equals the single-projection encode") {
    val merges = Bpe.learnMerges(corpus, "text", numMerges = 5)
    val in = Seq("lowest low newest", "wide widest lower").toDF("text")
    val viaColumn = in.select(col("text"),
      Bpe.encode(col("text"), merges).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[scala.collection.Seq[String]](1)
        .map(_.toList).toList).toMap
    // stageEvery=2 forces three materialized stages for five merges
    val viaTable = Bpe.encodeTable(in, "text", "toks", merges, stageEvery = 2)
      .collect().map(r => r.getString(0) -> r.getSeq[scala.collection.Seq[String]](1)
        .map(_.toList).toList).toMap
    assert(viaTable == viaColumn)
    assert(viaTable("lowest low newest").head == List("low", "est" + Bpe.EndOfWord))
  }
}

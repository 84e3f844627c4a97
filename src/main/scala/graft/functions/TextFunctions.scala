package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis column functions for the LLM-pipeline surface
 * (SURVEY.md §2.11): tokenization, shingling, MinHash / SimHash
 * signatures, language-ID heuristic, quality scoring, fingerprinting.
 *
 * Everything is built from codegen'd `functions._` higher-order ops —
 * per-row, executor-local, no shuffles, no UDFs — so each function costs
 * O(tokens) per document and scales linearly to 100 TB.
 */
object TextFunctions {

  /** Whitespace tokenizer (documents.text is space-separated tokens). */
  def tokens(text: Column): Column = split(text, " +")

  /** BPE-ish subword split: words, numbers, or single punctuation marks. */
  def bpeishTokens(text: Column): Column =
    filter(split(text, "(?=[^\\p{L}\\p{N}])|(?<=[^\\p{L}\\p{N}])"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** k-gram word shingles: ["a","b","c","d"], k=3 → ["a b c","b c d"].
    * Shingles (not raw tokens) drive near-dup joins: their large key space
    * keeps inverted-index join fan-out bounded when the vocabulary is small. */
  def shingles(toks: Column, k: Int = 3): Column =
    // guard: sequence(1, n) with n<1 would DESCEND, not return empty
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(o => element_at(toks, i + o)): _*)))
      .otherwise(array())

  def distinctShingles(text: Column, k: Int = 3): Column =
    array_distinct(shingles(tokens(text), k))

  /**
   * MinHash signature: `numHashes` permutations h_i(s) = xxhash64(i, s);
   * signature[i] = min over the doc's shingles. Estimated Jaccard of two
   * docs = fraction of agreeing signature positions.
   */
  def minHashSignature(shingleSet: Column, numHashes: Int = 32): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingleSet, s => xxhash64(i, s))))

  /** LSH band keys: signature split into `bands` bands of `rows` ints, each
    * band hashed to one bucket key. Candidate pairs = same (band, bucket). */
  def minHashBands(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map(b =>
      struct(lit(b).as("band"), xxhash64(slice(sig, b * rows + 1, rows)).as("bucket"))): _*)

  /**
   * 64-bit SimHash over a shingle/token set: bit b is set iff
   * Σ_s (bit b of xxhash64(s) ? +1 : -1) > 0. Hamming distance between
   * SimHashes tracks cosine similarity of the feature sets.
   */
  def simHash64(shingleSet: Column): Column = {
    val bitCols: Seq[Column] = (0 until 64).map { b =>
      val vote = aggregate(shingleSet, lit(0),
        (acc, s) => acc + when(shiftright(xxhash64(s), b).bitwiseAND(lit(1)) === 1, 1).otherwise(-1))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash blocking keys: the signature sliced into `bands` contiguous
    * bit ranges (widths differ by at most 1 when 64 % bands ≠ 0); docs
    * within Hamming distance ≤ bands−1 are GUARANTEED to collide on ≥1
    * band (pigeonhole: that many mismatched bits cannot touch every band). */
  def simHashBands(sig: Column, bands: Int = 13): Column = {
    val base = 64 / bands
    val rem = 64 % bands
    val widths = Seq.fill(rem)(base + 1) ++ Seq.fill(bands - rem)(base)
    val offsets = widths.scanLeft(0)(_ + _)
    array((0 until bands).map { b =>
      val mask = (1L << widths(b)) - 1
      struct(lit(b).as("band"), shiftright(sig, offsets(b)).bitwiseAND(lit(mask)).as("bucket"))
    }: _*)
  }

  /**
   * Language-ID heuristic (SURVEY.md §2.11): character-class probes first
   * (CJK / kana / hangul / cyrillic / arabic ranges), then tiny stopword
   * profiles for latin-script languages. Deterministic, SQL-expressible.
   */
  def langGuess(text: Column): Column = {
    val t = concat(lit(" "), lower(text), lit(" "))
    def hasAny(words: Seq[String]): Column =
      words.map(w => t.contains(s" $w ")).reduce(_ || _)
    when(text.rlike("[\\u4e00-\\u9fff]"), "zh")
      .when(text.rlike("[\\u3040-\\u30ff]"), "ja")
      .when(text.rlike("[\\uac00-\\ud7af]"), "ko")
      .when(text.rlike("[\\u0400-\\u04ff]"), "ru")
      .when(text.rlike("[\\u0600-\\u06ff]"), "ar")
      .when(hasAny(Seq("el", "la", "de", "los", "las", "una", "para", "que")), "es")
      .when(hasAny(Seq("le", "les", "des", "est", "une", "dans", "pour")), "fr")
      .when(hasAny(Seq("der", "die", "das", "und", "ist", "nicht", "ein")), "de")
      .when(hasAny(Seq("the", "a", "an", "is", "of", "and", "to", "in")), "en")
      .otherwise("und")
  }

  private val Stopwords = Seq("the", "a", "an", "is", "of", "and", "to", "in")

  /** Stopword ratio ∈ [0,1] — exact rational arithmetic then one division,
    * so it is bit-deterministic for the DuckDB oracle. */
  def stopwordRatio(toks: Column): Column = {
    val stop = size(filter(toks, t => t.isin(Stopwords: _*)))
    when(size(toks) > 0, stop.cast("double") / size(toks).cast("double")).otherwise(0.0)
  }

  /** Mean token length (chars), exact counts then one division. */
  def meanTokenLen(toks: Column): Column =
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks).cast("double"))
      .otherwise(0.0)

  /** Type-token ratio — vocabulary richness. */
  def typeTokenRatio(toks: Column): Column =
    when(size(toks) > 0,
      size(array_distinct(toks)).cast("double") / size(toks).cast("double")).otherwise(0.0)

  /**
   * Document quality score ∈ [0,1]: length band + vocabulary richness −
   * stopword dominance. A deterministic toy stand-in for fastText-style
   * quality classifiers; thresholds tuned for the synthetic corpus.
   */
  def qualityScore(text: Column): Column = {
    val t = tokens(text)
    val lenScore = when(size(t).between(20, 80), 0.4)
      .when(size(t).between(10, 150), 0.2).otherwise(0.0)
    val richScore = typeTokenRatio(t) * 0.4
    val stopPenalty = stopwordRatio(t) * 0.2
    round(lenScore + richScore - stopPenalty, 6)
  }

  /**
   * Order-sensitive document fingerprint: Σ_pos (pos+1)·(131·len(tok)+ascii(tok))
   * mod 1e9+7. Exact integer arithmetic — identical in any engine; the
   * positional weight makes it sensitive to token order (a rolling-hash
   * analogue that stays expressible as a plain SUM for the oracle).
   */
  def fingerprint(toks: Column): Column = {
    val weighted = zip_with(toks, sequence(lit(1), size(toks)),
      (t, pos) => pos.cast("long") * (lit(131L) * length(t) + ascii(t)))
    pmod(aggregate(weighted, lit(0L), (acc, x) => acc + x), lit(1000000007L))
  }

  /**
   * Deterministic token masking for reproducible MLM-style corpora: token
   * at (1-based) position p of document d is replaced by `[MASK]` iff
   * (d·2654435761 + p·97) mod 100 < ratePct. An arithmetic slot, not an
   * RNG, for the same reason as [[graft.operators.Sampling]]: masked
   * corpora must be identical across engines, retries, and partitionings,
   * and the decision must be recomputable by the oracle.
   *
   * Returns the masked token ARRAY (callers `concat_ws` back to text and
   * count masks with a codegen'd `filter`). Per-row single-level HOF over
   * a few dozen tokens — no per-document re-evaluation blowup (the
   * interpreted-HOF trap needs nesting or cross-row fan-out).
   */
  def maskTokens(docId: Column, text: Column, ratePct: Int): Column = {
    require(ratePct >= 0 && ratePct <= 100, "ratePct must be in [0, 100]")
    transform(tokens(text), (t, i) =>
      when(pmod(docId.cast("long") * lit(2654435761L) + (i + 1).cast("long") * lit(97L),
        lit(100L)) < lit(ratePct.toLong), lit("[MASK]")).otherwise(t))
  }

  /**
   * PII scrubbing patterns — deliberately restricted to regex constructs
   * with identical semantics in Java regex (Spark codegen) and RE2
   * (DuckDB oracle): character classes, bounded repetition, `\b`. No
   * lookaround, no backreferences.
   */
  val EmailPattern = "[a-z0-9._]+@[a-z0-9]+\\.[a-z]+"
  val PhonePattern = "\\b[0-9]{3}-[0-9]{4}\\b"

  /** Redact emails then phone numbers — per-row codegen'd regex, no
    * shuffle; the replacement order is part of the contract (an email's
    * digits can never re-match as a phone once collapsed to the tag). */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** Match count for a PII pattern on the ORIGINAL text (audit metric). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("int")
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * BPE tokenizer TRAINING as a distributed pipeline (Sennrich, Haddow &
 * Birch 2016, ACL — "Neural Machine Translation of Rare Words with
 * Subword Units"; the algorithm every modern LLM tokenizer descends
 * from). The reference engine has no tokenizer tier; this is the
 * extension surface the brief's training-data mandate asks for —
 * `TextFunctions.bpeishTokens` APPLIES a fixed regex segmentation, this
 * learns the merge table itself from the corpus.
 *
 * Scale shape: the corpus is collapsed ONCE into a word vocabulary with
 * frequencies (one explode + hash aggregate — the corpus is never touched
 * again, and the vocab is orders of magnitude smaller: Heaps' law, ~1e6–
 * 1e8 distinct words at 100 TB, well inside distributed-aggregate range).
 * Each merge iteration is then two vocab-sized distributed steps:
 * (1) pair counting — explode adjacent token pairs weighted by word
 * frequency, one partial+final hash aggregate; (2) the argmax pair
 * (ONE row) is collected to the driver and folded into every word's
 * token array with a codegen'd `aggregate` higher-order function (greedy
 * left-to-right, exactly the paper's merge semantics). Nothing
 * driver-side ever holds more than the single best pair and the merge
 * table (numMerges rows); the vocab is re-materialized to parquet every
 * [[checkpointEvery]] iterations so plan lineage stays bounded.
 */
object Bpe {

  /** End-of-word marker from the paper — keeps "est" in "lowest" distinct
    * from "est" at a word boundary. */
  val EndOfWord = "</w>"

  /** Word vocabulary with frequencies: the ONE corpus-sized pass. */
  def wordVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** Greedy left-to-right single-pass merge of adjacent (a, b) token
    * pairs — the paper's replacement step as a codegen'd array fold: if
    * the accumulator's last token is `a` and the next is `b`, replace the
    * pair with `ab`; a merged token is never re-extended in the same pass
    * (the fold advances past it), matching the reference implementation's
    * scan. Pure Catalyst (no UDF): `lit(...)` carries the pair, so no
    * SQL-string escaping hazards on real text. */
  private[graft] def mergePair(toks: Column, a: String, b: String): Column =
    aggregate(toks, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /**
   * Learn `numMerges` BPE merge rules. Returns the ordered merge table
   * `(rank, left, right)` — rank 0 first. Ties in pair frequency break
   * deterministically by (left asc, right asc) so the merge table is
   * reproducible across runs and partitionings.
   */
  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int,
      checkpointEvery: Int = 8): Seq[(Int, String, String)] = {
    var vocab = Materialize.viaParquet(
      wordVocab(docs, textCol).withColumn("toks",
        concat(split(col("w"), ""), array(lit(EndOfWord)))),
      "bpe_vocab")
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      // adjacent pairs weighted by word frequency; one hash aggregate
      val best = vocab
        .select(col("cnt"), explode(
          zip_with(slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (l, r) => struct(l.as("a"), r.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("total"))
        .orderBy(col("total").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((rank, a, b))
        val next = vocab.withColumn("toks", mergePair(col("toks"), a, b))
        vocab =
          if ((rank + 1) % checkpointEvery == 0)
            Materialize.viaParquet(next, "bpe_vocab") // bound plan lineage
          else next
        rank += 1
      }
    }
    merges.toSeq
  }

  /** Encode text with a learned merge table: char-split each word, apply
    * every merge in rank order (the fold is codegen'd per merge). Cost is
    * numMerges chained projections per row — the standard trade for an
    * in-plan encoder; production tokenizers bake the table into a trie,
    * which is exactly what this output feeds. */
  def encode(text: Column, merges: Seq[(Int, String, String)]): Column = {
    val words = split(lower(text), "[^a-z0-9]+")
    val charToks = transform(filter(words, w => length(w) > 0),
      w => concat(split(w, ""), array(lit(EndOfWord))))
    merges.sortBy(_._1).foldLeft(charToks) { case (toksPerWord, (_, a, b)) =>
      transform(toksPerWord, t => mergePair(t, a, b))
    }
  }
}

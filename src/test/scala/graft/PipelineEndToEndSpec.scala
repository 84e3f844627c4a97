package graft

import graft.functions.TextFunctions._
import graft.operators.{Dedup, Sampling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * End-to-end training-data pipeline over the real corpus fixture: the
 * composition a user of this library would actually run —
 *
 *   exact dedup → near-dup clustering keep-one → decontamination vs an
 *   eval set → quality/language filtering → stratified mixing
 *
 * Each stage is individually oracle-checked by its own registered query;
 * this spec proves they COMPOSE: outputs feed inputs, invariants hold at
 * every step, and the final corpus is a strict, well-formed subset.
 */
class PipelineEndToEndSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dedup -> decontam -> quality -> mix composes on the corpus fixture") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val total = docs.count()

    // 1. exact dedup (keep min doc_id per identical text)
    val exact = Dedup.exactDedup(docs, "doc_id", Seq("text"))
    val nExact = exact.count()
    assert(nExact <= total)
    assert(exact.select("text").distinct().count() == nExact,
      "exact dedup must leave texts unique")

    // 2. near-dup clustering keep-one (jaccard >= 0.6 components)
    val pairs = Dedup.jaccardPairs(exact, "doc_id", "text").filter(col("jaccard") >= 0.6)
    val clusters = Dedup.clusterPairs(pairs)
    val dropIds = clusters.filter(col("id") =!= col("cluster")).select(col("id").as("doc_id"))
    val nearDeduped = exact.join(dropIds, Seq("doc_id"), "left_anti")
    val nNear = nearDeduped.count()
    assert(nNear == nExact - dropIds.count(), "keep-one must drop exactly the non-representatives")
    // no surviving pair of docs is jaccard >= 0.6 near-identical
    val survivors = Dedup.jaccardPairs(nearDeduped, "doc_id", "text")
      .filter(col("jaccard") >= 0.6).count()
    assert(survivors == 0, s"$survivors near-dup pairs survived keep-one")

    // 3. decontamination against a held-out "eval set" (first 20 ids)
    val evalSet = docs.filter(col("doc_id") < 20)
    val contaminated = Dedup.contaminationPairs(
        nearDeduped.filter(col("doc_id") >= 20), evalSet, "doc_id", "text", k = 5)
      .filter(col("overlap") >= 3)
      .select(col("corpus_id").as("doc_id")).distinct()
    val clean = nearDeduped.filter(col("doc_id") >= 20)
      .join(contaminated, Seq("doc_id"), "left_anti")
    assert(clean.count() <= nNear)

    // 4. quality + language gate
    val scored = clean
      .withColumn("quality", qualityScore(col("text")))
      .withColumn("lang_guess", langGuess(col("text")))
    val gated = scored.filter(col("quality") >= 0.2 && col("lang_guess") =!= "und")
    val nGated = gated.count()
    assert(nGated > 0, "quality gate emptied the corpus — thresholds wrong for fixture")

    // 5. stratified mixing: halve the dominant language
    val top = gated.groupBy(col("lang")).count().orderBy(col("count").desc, col("lang"))
      .select("lang").as[String].head()
    val mixed = Sampling.stratifiedSample(gated, "doc_id", "lang", Map(top -> (1, 2)))
    val rep = Sampling.mixtureReport(gated, mixed, "lang")
      .select("lang", "n_total", "n_kept").as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val (tTot, tKept) = rep(top)
    assert(tKept <= tTot / 2 + 1, s"dominant stratum not halved: $tKept of $tTot")
    rep.filterKeys(_ != top).foreach { case (l, (n, k)) =>
      assert(n == k, s"non-target stratum $l lost rows: $k of $n")
    }
    // the pipeline output is a strict, well-formed subset of the input
    assert(mixed.count() > 0 && mixed.count() < total)
    assert(mixed.join(docs, Seq("doc_id"), "left_anti").count() == 0,
      "pipeline invented rows not present in the source corpus")
  }
}

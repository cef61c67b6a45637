package graft.operators

import graft.functions.Hashes
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for a training-data pipeline over a `documents`
 * table (doc_id, text, ...). Everything except the hash fingerprint stays
 * in codegen'd Catalyst expressions (split/size/filter HOFs); the
 * fingerprint is a typed map over a deterministic integer polynomial
 * (see [[graft.functions.Hashes]]) so the DuckDB oracle can replicate it.
 */
object TextAnalysis {

  private def toks(c: Column): Column = split(c, " ")

  /** (doc_id, n_tokens) — whitespace tokenization. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(toks(col("text"))).cast("long").as("n_tokens"))

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and")

  /** Quality signals: token count, char count, stopword ratio and mean
    * token length (both scaled to int 1e4 so results are engine-portable). */
  def quality(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val nTok = size(t).cast("long")
    val nChars = length(col("text")).cast("long")
    val stopCnt = size(filter(t, x => x.isin(Stopwords: _*))).cast("long")
    // NOTE: multiply-before-divide ((1e4*a)/b), matching the oracle SQL
    // operation order exactly — a/b then *1e4 can differ in the last ulp.
    docs.select(
      col("doc_id"),
      nTok.as("n_tokens"),
      nChars.as("n_chars"),
      round(lit(10000.0) * stopCnt / nTok).cast("long").as("stop_ratio_i4"),
      // tokens are single-space separated: token chars = chars - (n-1)
      round(lit(10000.0) * (nChars - nTok + 1) / nTok).cast("long")
        .as("avg_token_len_i4"))
  }

  /** Per-language marker words (n-gram-heuristic language ID). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a"),
    "de" -> Seq("der", "und"),
    "fr" -> Seq("le", "la"),
    "es" -> Seq("el", "los"))

  /** (doc_id, pred_lang): argmax of marker-token counts; ties resolve in
    * LangMarkers order; no markers at all → "und". */
  def langId(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val counts = LangMarkers.map { case (lang, ms) =>
      lang -> size(filter(t, x => x.isin(ms: _*))).cast("long")
    }
    val total = counts.map(_._2).reduce(_ + _)
    // argmax with first-wins tie-break, expressed as nested whens
    val best = counts.tail.foldLeft(
      (counts.head._2, lit(counts.head._1))) { case ((bc, bl), (lang, c)) =>
      (when(c > bc, c).otherwise(bc), when(c > bc, lit(lang)).otherwise(bl))
    }._2
    docs.select(col("doc_id"),
      when(total === 0, lit("und")).otherwise(best).as("pred_lang"))
  }

  /** (doc_id, fp): rolling-style document fingerprint. */
  def fingerprints(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        (id, Hashes.fingerprint(text.split(" ").toSeq))
      }.toDF("doc_id", "fp")
  }
}

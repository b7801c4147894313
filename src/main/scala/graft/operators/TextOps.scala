package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis family (north-star extension, BASELINE.json): language ID,
  * quality scoring, token counting, fingerprinting over `documents`.
  *
  * All per-document computations are narrow (no shuffle): at 100 TB each
  * partition of documents streams through one codegen'd projection. The only
  * shuffles are the explicitly aggregating fingerprint (min per doc after a
  * shingle explode — partial aggregation makes it map-side) — nothing here
  * is quadratic or collect-based.
  */
object TextOps {

  /** Token counting: whitespace tokens + BPE-ish regex tokens. */
  def tokenCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      size(words(col("text"))).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit(TokenRe), lit(0))).cast("long")
        .as("n_re_tokens"))

  /** Quality scoring: length / word-shape / stopword-ratio heuristics. */
  def qualityScores(spark: SparkSession, sfDir: String): DataFrame = {
    val w = words(col("text"))
    val nWords = size(w).cast("double")
    val nStop = profileHits(col("text"), LangProfiles.head._2).cast("double")
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_actual"),
      size(w).cast("long").as("n_words"),
      (length(regexp_replace(col("text"), " ", "")).cast("double") / nWords)
        .as("avg_word_len"),
      (nStop / nWords).as("stopword_ratio"),
      (least(nWords / 100.0, lit(1.0)) * (lit(0.5) + lit(0.5) * (nStop / nWords)))
        .as("quality_score"))
  }

  /** Language ID: n-gram/stopword-profile heuristic — argmax of per-language
    * profile hits with a fixed preference order, 'und' when no profile hits.
    */
  def languageId(spark: SparkSession, sfDir: String): DataFrame = {
    val hits = LangProfiles.map { case (lang, prof) =>
      lang -> profileHits(col("text"), prof)
    }
    val best = hits.map(_._2).reduce(greatest(_, _))
    val predicted = hits.foldRight(lit("und")) { case ((lang, h), acc) =>
      when(h === best && best > 0, lit(lang)).otherwise(acc)
    }
    // foldRight + when-chains ⇒ first profile in LangProfiles wins ties
    Tables.documents(spark, sfDir).select(
      (col("doc_id") +: hits.map { case (l, h) => h.cast("long").as(s"hits_$l") } :+
        predicted.as("predicted_lang")): _*)
  }

  /** Document fingerprinting: winnowing-style representative shingle — the
    * minimum-hash shingle of each document (rolling-hash family; the h24
    * hash plays the rolling polynomial's role, portable to the oracle).
    */
  def fingerprints(spark: SparkSession, sfDir: String): DataFrame =
    // one hash aggregate, map-side combinable: min(struct(h, shingle))
    // compares h first, then shingle — so .shingle is the lexicographically
    // least shingle among min-hash achievers (h24 collisions at the min are
    // rare but nonzero; arg_min alone would be nondeterministic there).
    // min is multiset-insensitive, so the scan is the dedup chain's cached
    // distinct-shingle table — one corpus explode shared across families.
    DedupOps.distinctShingles(spark, sfDir)
      .select(col("doc_id"), struct(h24(col("shingle")).as("h"), col("shingle")).as("hs"))
      .groupBy(col("doc_id"))
      .agg(min(col("hs")).as("mn"))
      .select(col("doc_id"), col("mn.h").as("fingerprint"),
        col("mn.shingle").as("rep_shingle"))
}

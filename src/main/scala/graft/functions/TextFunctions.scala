package graft.functions

import graft.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the LLM-pipeline operators (north-star
  * extensions, BASELINE.json): tokenization, shingling, portable hashing.
  * Everything here is built from codegen'd `functions._` / higher-order
  * functions — no Scala UDFs — so the whole text pipeline stays inside
  * WholeStageCodegen where possible and is expressible 1:1 in the DuckDB
  * oracle dialect.
  */
object TextFunctions {

  /** Whitespace tokens (corpus text is single-space word soup). */
  def words(text: Column): Column = split(text, " ")

  /** BPE-ish token pattern: letter runs, digit runs, single punctuation. */
  val TokenRe = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** Word 3-gram shingles as an array column — the unit for MinHash /
    * Jaccard dedup. Empty array for texts under 3 words.
    *
    * Callers on a corpus scan should project `words(text)` to an attribute
    * and use [[shingles3OfWords]]: expressions inside the transform lambda
    * sit outside common-subexpression elimination, so passing the raw
    * `words(text)` expression re-runs the split for every element_at —
    * O(words²) per document (measured 5.5x on the bigram twin at sf0.1).
    */
  def shingles3(text: Column): Column = shingles3OfWords(words(text))

  /** [[shingles3]] over an already-materialized word-array column. */
  def shingles3OfWords(w: Column): Column =
    when(size(w) >= 3,
      transform(sequence(lit(1), size(w) - 2), i =>
        concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** Portable 24-bit hash (md5 prefix) — see [[Tables.h24]]. */
  def h24(c: Column): Column = Tables.h24(c)

  /** English-y stopword profiles for the language-ID heuristic. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "y", "que", "un"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un"))

  /** Count of words that are in the given profile. */
  def profileHits(text: Column, stopwords: Seq[String]): Column =
    size(filter(words(text), w => w.isInCollection(stopwords)))
}

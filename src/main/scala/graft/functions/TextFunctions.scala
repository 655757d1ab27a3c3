package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives as native Column expressions — every one stays inside
  * whole-stage codegen (no UDFs, no object boundaries). These are the
  * building blocks for the reference's signature operator (hashtag
  * explode, TwitterDatasetTrendingHashtag.java:369-387 /
  * TwitterDStreamTrendingHashtag.java:60-78) and for the LLM-pipeline
  * text analysis (SURVEY.md §2.3 Q3/Q18).
  */
object TextFunctions {

  /** O5: all `#\w+` hashtags of a text, in order — the reference's
    * regex at TwitterDStreamTrendingHashtag.java:66 re-expressed as a
    * Catalyst-native extraction (null text → empty array, mirroring the
    * permissive DStream path). */
  def hashtags(text: Column): Column =
    regexp_extract_all(coalesce(text, lit("")), lit("#\\w+"), lit(0))

  /** Whitespace tokenization (documents.text is single-space separated;
    * the regex split also handles tabs/newlines in open-world input).
    *
    * PERFORMANCE CONTRACT for all token-consuming functions below: pass
    * a *materialized attribute* (`.withColumn("toks", tokens(...))`),
    * never this expression inline. Catalyst duplicates the argument tree
    * at every use site — `element_at(tokens(text), i)` inside a
    * transform lambda re-runs the regex split per element, turning a
    * linear scan into O(tokens²) per row (measured 10× on q16b). */
  def tokens(text: Column): Column =
    split(coalesce(text, lit("")), "\\s+")

  private def ensureKernels(): Unit =
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(TextKernels.ensureRegistered)

  /** Adjacent-token bigrams, `"a b"` strings; < 2 tokens (or null) →
    * empty. Native [[WordBigrams]] kernel (round 21, guide §4 — the
    * former transform(sequence(…)) form was interpreted per element). */
  def bigrams(toks: Column): Column = {
    ensureKernels()
    call_function(TextKernels.bigramsFnName,
      coalesce(toks, array().cast("array<string>")))
  }

  /** Distinct word k-shingles (k consecutive tokens joined by spaces) —
    * the near-dup unit for MinHash/Jaccard. < k tokens (or null) →
    * empty set. Native [[WordShingles]] kernel (round 21, guide §4):
    * the transform + concat_ws + array_distinct pipeline was
    * CodegenFallback — an interpreted lambda per shingle per row,
    * measured 0.64 s per full-corpus evaluation at sf0.1 and paid per
    * probe pass by every MinHash consumer; the kernel emits the same
    * strings in the same first-occurrence order. */
  def shingles(toks: Column, k: Int): Column = {
    ensureKernels()
    call_function(TextKernels.shinglesFnName,
      coalesce(toks, array().cast("array<string>")), lit(k))
  }

  /** Deterministic document fingerprint: polynomial rolling hash over a
    * per-token code (length*131 + first char), mod 1e9+7. Pure 64-bit
    * arithmetic — reproducible on any engine (DuckDB twin:
    * list_reduce(list_prepend(7, list_transform(...)), ...)). */
  def fingerprint(toks: Column): Column =
    aggregate(
      transform(toks, t => (length(t) * lit(131L) + ascii(substring(t, 1, 1))).cast("long")),
      lit(7L),
      (acc, v) => pmod(acc * lit(31L) + v, lit(1000000007L)))

  /** Highest single-token occurrence count — the numerator of the
    * "top-token dominance" repetition signal (the most boilerplate-like
    * token's share of the document). Native [[TopTokenCount]] kernel:
    * one hash-count pass per row (the former aggregate(array_distinct)
    * × filter form was O(distinct × tokens) INTERPRETED comparisons per
    * row — CodegenFallback, not codegen as its old comment claimed).
    * Still a pure map with zero shuffles; the explode + groupBy(doc,
    * token) + max alternative would shuffle the corpus's entire token
    * stream to compute a per-row scalar. */
  def topTokenCount(toks: Column): Column = {
    ensureKernels()
    call_function(TextKernels.topTokenFnName, toks)
  }

  /** Marker-token score: how many tokens of `text` fall in `markers`.
    * The unit of the language-ID heuristic (score per language, argmax). */
  def markerScore(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(lit): _*)))

  /** Language-ID heuristic over marker-token lists: argmax score with
    * first-listed-wins tie-break (deterministic; langs evaluated in the
    * given order). Returns the language code column. */
  def langId(toks: Column, profiles: Seq[(String, Seq[String])]): Column = {
    val scores = profiles.map { case (lang, ms) => lang -> markerScore(toks, ms) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit(null).cast("string")) { case ((lang, s), acc) =>
      when(s === best, lit(lang)).otherwise(acc)
    }
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text analysis (SURVEY §2.5). Everything here composes
  * built-in codegen'd functions — no UDF closures — so these stay
  * inside WholeStageCodegen at 100 TB.
  *
  * Language stopword lists are mirrored verbatim in the DuckDB oracle
  * SQL (TextRegistry); change them in both places or parity breaks.
  */
object TextFunctions {

  /** Whitespace tokenization; trims first so clean text never yields
    * empty tokens.
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Split-free codegen'd count (HashExpressions.WsTokenCount) —
    * size(split(...)) materializes the token array to measure it.
    * Use `size(toks)` instead when the array is needed anyway.
    */
  def tokenCount(text: Column): Column =
    graft.functions.HashFunctions.ws_token_count(text)

  /** BPE-ish subword proxy: runs of letters / digits / single other
    * symbols — the standard pre-tokenizer split. Codegen'd
    * single-pass kernel (HashExpressions.BpeTokenCount): the
    * regexp_extract_all form materializes every match into an array
    * just to count it — the dominant text-op cost at the 100× probe.
    */
  def bpeTokenCount(text: Column): Column =
    graft.functions.HashFunctions.bpe_token_count(text)

  /** Punctuation character count (explicit ASCII class — identical
    * in Java regex and RE2). Codegen'd in-place counter: the
    * length-difference idiom rewrites the string per row.
    */
  def punctCount(text: Column): Column =
    graft.functions.HashFunctions.punct_count(text)

  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "los", "y", "es", "un"),
    "fr" -> Seq("le", "la", "les", "et", "des", "est", "un"))

  /** Number of token occurrences that are stopwords of `lang`. */
  /** Stopword occurrence count. Codegen'd single-pass kernel over the
    * raw text (HashExpressions.StopwordHits): the
    * filter+array_contains form walks the materialized token array
    * with a per-element lambda. Semantics identical — a token is a
    * maximal non-\s run; empty tokens never match.
    */
  def stopwordHits(text: Column, lang: String): Column =
    graft.functions.HashFunctions.stopword_hits(text, lang)

  /** Distinct stopword *types* of `lang` present — the language-ID
    * signal (type overlap is more robust than occurrence counts for
    * short docs).
    */
  def stopwordTypes(toks: Column, lang: String): Column =
    size(array_intersect(array_distinct(toks),
      array(stopwords(lang).map(lit): _*)))

  /** Heuristic language ID: argmax of per-language distinct-stopword
    * hits, ties broken in fixed order en > de > es > fr; no hits →
    * 'und'. Codegen'd one-pass kernel (HashExpressions.LangId): the
    * 4×(array_distinct + array_intersect) column formulation
    * materialized and re-walked the token array nine times per row.
    * Deterministic and SQL-expressible for the oracle.
    */
  def langId(text: Column): Column =
    graft.functions.HashFunctions.lang_id(text)

  /** Quality score in [0,1]: blend of length band, stopword presence
    * and punctuation sanity — the usual cheap pre-filter before
    * expensive dedup. Fully array-free: every count is a single-pass
    * codegen kernel over the raw text. One double division per term,
    * for oracle determinism.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nChar = length(text).cast("double")
    val swRatio = stopwordHits(text, "en").cast("double") / nTok
    val punctRatio = punctCount(text).cast("double") / nChar
    val lenScore = when(nTok >= 20 && nTok <= 1000, lit(1.0))
      .when(nTok >= 5, lit(0.5)).otherwise(lit(0.0))
    val swScore = when(swRatio >= 0.01 && swRatio <= 0.5, lit(1.0))
      .otherwise(lit(0.0))
    val punctScore = when(punctRatio <= 0.2, lit(1.0)).otherwise(lit(0.0))
    (lenScore * 0.5 + swScore * 0.3 + punctScore * 0.2)
  }

  /** Back-compat shim: the token array is no longer needed. */
  def qualityScoreFrom(text: Column, toks: Column): Column =
    qualityScore(text)

  /** Canonical-form md5 fingerprint: collapse whitespace, trim, hash.
    * Identical builtin in DuckDB → oracle-checkable. One-pass codegen
    * kernel, bit-identical to md5(regexp_replace(trim(text), '\s+',
    * ' ')) (prop-pinned) without materializing the rewritten string.
    */
  def fingerprintMd5(text: Column): Column =
    graft.functions.HashFunctions.canonical_md5(text)

  /** Word n-gram shingles (space-joined), the dedup unit, from a
    * pre-split token column.
    *
    * IMPORTANT: pass an attribute (a materialized `withColumn`), not
    * a computed expression — the lambda body references `toks` from
    * outside the lambda, so Catalyst re-evaluates it per element: a
    * split() argument turns O(tokens) into O(tokens²) per row (measured
    * 55 s → 3 s on dedup_jaccard_pairs at sf0.1).
    */
  def wordShinglesFrom(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** Convenience for one-shot use on short texts; prefer
    * `wordShinglesFrom` over a materialized token column in hot paths.
    */
  def wordShingles(text: Column, n: Int): Column =
    wordShinglesFrom(tokens(text), n)
}

package graft.functions

import org.apache.spark.sql.Column

/** User-facing Column API for the custom codegen array expressions.
  * The Expression classes themselves live in
  * [[org.apache.spark.sql.graft]] (they need `private[sql]` Spark
  * internals — `AbstractDataType`, `classic.ExpressionUtils`); this
  * forwarder keeps graft call sites inside the graft namespace. SQL
  * names (`graft_dot`, `graft_simhash64`) are registered by
  * [[graft.GraftExtensions]].
  */
object ArrayExpressions {

  /** Codegen'd dot product of two double-array columns (tight generated
    * Java loop; a zip_with+aggregate formulation is interpreted per
    * element and measured ~10× slower on the similarity pair joins). */
  def dotProduct(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ArrayExpressions.dotProduct(a, b)

  /** Codegen'd 64-bit SimHash over an array-of-string tokens column. */
  def simhash(tokens: Column): Column =
    org.apache.spark.sql.graft.ArrayExpressions.simhash(tokens)

  /** Codegen'd distinct word n-gram shingles of a text column. */
  def distinctShingles(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ArrayExpressions.distinctShingles(text, n)

  /** Codegen'd L2 normalization of a double-array column (NULL for
    * zero-norm vectors). */
  def l2normalize(vec: Column): Column =
    org.apache.spark.sql.graft.ArrayExpressions.l2normalize(vec)

  /** Codegen'd one-pass MinHash signature (array of `numHashes`
    * rotated-md5 lexicographic minima) over a shingle-array column —
    * NULL for empty shingle sets. Turns the signature build into a
    * shuffle-free projection; see
    * [[org.apache.spark.sql.graft.MinHashSignature]]. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    org.apache.spark.sql.graft.ArrayExpressions
      .minhashSignature(shingles, numHashes)

  /** Codegen'd banded random-hyperplane LSH buckets: one long per band,
    * all nBands·planesPerBand projections in a single generated loop —
    * replaces a 64-expression dot-product stack in the embedding
    * near-dup plan; see
    * [[org.apache.spark.sql.graft.HyperplaneBands]]. */
  def hyperplaneBands(vec: Column, dim: Int, nBands: Int,
                      planesPerBand: Int, seed: Long): Column =
    org.apache.spark.sql.graft.ArrayExpressions
      .hyperplaneBands(vec, dim, nBands, planesPerBand, seed)

  /** Codegen'd int8 quantize→dequantize round-trip of a unit-vector
    * column (the asymmetric-search coarse representation) — one
    * traversal instead of two interpreted transforms; see
    * [[org.apache.spark.sql.graft.QuantizeRoundTrip]]. */
  def quantizeRoundTrip(vec: Column): Column =
    org.apache.spark.sql.graft.ArrayExpressions.quantizeRoundTrip(vec)

  /** Codegen'd standard-analyzer tokenization (one generated char
    * scan; bit-identical to the regex spelling the oracles replay). */
  def analyzerTokens(text: Column): Column =
    org.apache.spark.sql.graft.ArrayExpressions.analyzerTokens(text)

  /** Codegen'd analyzed-token count (no array materialization). */
  def analyzerTokenCount(text: Column): Column =
    org.apache.spark.sql.graft.ArrayExpressions.analyzerTokenCount(text)

  /** Codegen'd single-pass (dl, matched-term-indices) struct — the
    * stats-scan rider behind the de-skewed BM25/tf·idf scorers (r19);
    * see [[org.apache.spark.sql.graft.TokenDlHits]]. */
  def tokenDlHits(text: Column, terms: Seq[String]): Column =
    org.apache.spark.sql.graft.ArrayExpressions.tokenDlHits(text, terms)

  /** Codegen'd ENGLISH-analyzer tokenization with positions
    * (array<struct<term, pos>>) — the executor-side twin of
    * [[EnglishAnalysis.analyzeWithPositions]]: possessive strip →
    * stop filter (position consumed) → Porter stem. The write-time
    * tokenizer of SearchIndex's index-time english analyzer. */
  def englishTokens(text: Column): Column =
    org.apache.spark.sql.graft.ArrayExpressions.englishTokens(text)

  /** Codegen'd write-time FRENCH analysis — (term, pos) structs with
    * elision, stop-consumed positions and light_french stems
    * (the english expression's twin). */
  def frenchTokens(text: Column): Column =
    org.apache.spark.sql.graft.ArrayExpressions.frenchTokens(text)

  /** Codegen'd write-time GERMAN analysis — (term, pos) structs with
    * stop-consumed positions, german_normalization and light_german
    * stems (the third language twin). */
  def germanTokens(text: Column): Column =
    org.apache.spark.sql.graft.ArrayExpressions.germanTokens(text)

  /** Codegen'd write-time SPANISH analysis — (term, pos) structs
    * with stop-consumed positions and light_spanish stems (the
    * fourth language twin; the stemmer folds accents itself). */
  def spanishTokens(text: Column): Column =
    org.apache.spark.sql.graft.ArrayExpressions.spanishTokens(text)

  /** Codegen'd write-time CUSTOM-CHAIN analysis — (term, pos)
    * structs from a settings-defined tokenizer+filter chain
    * ([[CustomChain]]); `chainJson` is the canonical spec the index
    * meta sidecar persists. */
  def chainTokens(text: Column, chainJson: String): Column =
    org.apache.spark.sql.graft.ArrayExpressions.chainTokens(text,
      chainJson)

  /** Codegen'd Search.tokenNorm: the padded double-space-joined
    * analyzed-token string, one pass. */
  def analyzerNorm(text: Column): Column =
    org.apache.spark.sql.graft.ArrayExpressions.analyzerNorm(text)

  /** Codegen'd full Damerau–Levenshtein distance (adjacent-character
    * transpositions as primitive edits) — ES `fuzziness` under its
    * default `transpositions: true`; pinned to DuckDB's
    * `damerau_levenshtein` for oracle replay. */
  def damerauLevenshtein(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ArrayExpressions.damerauLevenshtein(a, b)

}

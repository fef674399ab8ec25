package graft.functions

/** The ES `english` analyzer chain (standard tokenizer →
  * possessive stemmer → lowercase → english stop filter → Porter
  * stemmer) — the most common non-default analyzer a verbatim DSL
  * body selects on the reference's ES stack (the reference's `text`
  * mappings are standard-analyzed at write time, but `"analyzer":
  * "english"` at query time analyzes the QUERY with this chain;
  * src/search_api.py:38-46 forwards such bodies untouched).
  *
  * Driver-side twin of the generated per-row chain
  * ([[org.apache.spark.sql.graft.EnglishTokens]]): query text is
  * analyzed HERE (bounded, per request), document text inside the
  * scan. Both share [[stripPossessive]]/[[isStop]]/
  * [[PorterStemmer.stem]], so the two sides cannot drift.
  */
object EnglishAnalysis {

  /** Lucene's classic English stop set (`english_stop` /
    * EnglishAnalyzer.ENGLISH_STOP_WORDS_SET — 33 words). Matched
    * AFTER possessive stripping and lowercasing, BEFORE stemming,
    * exactly the filter order of ES's `english` analyzer. */
  val StopWords: Seq[String] = Seq(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
    "such", "that", "the", "their", "then", "there", "these", "they",
    "this", "to", "was", "will", "with")

  private val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](64)
    StopWords.foreach(s.add)
    s
  }

  def isStop(t: String): Boolean = stopSet.contains(t)

  /** `english_possessive_stemmer`: trailing `'s` drops (input is
    * already lowercased; the tokenizer only admits the ASCII
    * apostrophe inside tokens, so the curly-quote variant cannot
    * reach here). */
  def stripPossessive(t: String): String =
    if (t.length > 2 && t.charAt(t.length - 2) == '\'' &&
        t.charAt(t.length - 1) == 's') t.substring(0, t.length - 2)
    else t

  /** Analyze query text with the full english chain — ES analyzes
    * the query with the same analyzer as the field. Duplicates kept
    * (callers distinct where ES does). */
  def analyze(s: String): Seq[String] =
    TextFunctions.analyzeText(s).iterator
      .map(stripPossessive)
      .filterNot(isStop)
      .map(PorterStemmer.stem)
      .toSeq

  /** The conservative substring probe for a PREFILTER on a stemmed
    * term: Porter rewrites only suffixes, and no rule chain writes
    * more than the final 3 characters of the stem, so every word
    * stemming to `t` contains `t.dropRight(3)` as a prefix. Returns
    * None (no safe probe — caller must not prefilter) when the
    * remaining prefix is too short to prune anything. */
  def prefilterProbe(t: String): Option[String] = {
    val p = t.substring(0, math.max(0, t.length - 3))
    if (p.length >= 3) Some(p) else None
  }
}

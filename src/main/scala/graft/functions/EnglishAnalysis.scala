package graft.functions

/** The ES `english` analyzer chain (standard tokenizer →
  * possessive stemmer → lowercase → english stop filter → Porter
  * stemmer) — the most common non-default analyzer a verbatim DSL
  * body selects on the reference's ES stack
  * (src/search_api.py:38-46 forwards such bodies untouched).
  *
  * QUERY-side only, exactly ES's query-time-analyzer semantics: the
  * reference's `text` mappings are standard-analyzed at write time,
  * so `"analyzer": "english"` on a match clause analyzes the QUERY
  * with this chain and the resulting stems are searched as literal
  * terms against the standard-analyzed document tokens and the
  * standard BM25 statistics (a query for "running" matches only
  * documents holding the literal token "run"). Documents are never
  * english-analyzed — there is no per-row stemming expression, and
  * stemmed terms ride every standard path unchanged (contains
  * prefilter, postings probes, phrase statistics).
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
    analyzeWithPositions(s).map(_._1)

  /** [[analyze]] keeping each surviving stem's ORIGINAL token
    * position — the stop filter removes tokens but CONSUMES positions
    * (Lucene's enablePositionIncrements), so a phrase query analyzed
    * with this chain carries gaps where stopwords stood ("sorted the
    * windows" → (sort, 0), (window, 2)) and phrase matching honors
    * them against the standard document positions. */
  def analyzeWithPositions(s: String): Seq[(String, Int)] =
    TextFunctions.analyzeText(s).iterator.zipWithIndex
      .map { case (t, i) => (stripPossessive(t), i) }
      .filter { case (t, _) => !isStop(t) }
      .map { case (t, i) => (PorterStemmer.stem(t), i) }
      .toSeq
}

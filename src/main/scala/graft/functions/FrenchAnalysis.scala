package graft.functions

/** The engine's FRENCH analyzer chain (standard tokenizer → elision
  * → lowercase → french stop filter → LIGHT french stemmer) —
  * the second language chain, proving the english plumbing
  * ([[EnglishAnalysis]]) generalizes: same shape, different filters.
  *
  * ES's prebuilt `french` analyzer runs
  * `french_elision → lowercase → french_stop → french_stemmer`
  * where `french_stemmer` defaults to `light_french` (Savoy's light
  * stemmer — [[FrenchLightStemmer]]); since round 17 this chain
  * stems with exactly that, so a verbatim ES body naming `french`
  * answers here as it does on ES 8.11. The heavier Snowball
  * algorithm remains available as [[FrenchStemmer]] — ES's
  * `stemmer: "french"` token-filter form, reachable through
  * `_analyze`'s explicit filter-chain route.
  *
  * QUERY-side (like english): documents stay standard-analyzed, the
  * stems search as literal terms against standard tokens and
  * statistics. The stop filter CONSUMES positions (Lucene's
  * increments), so french phrases carry gaps where stopwords stood.
  */
object FrenchAnalysis {

  /** Lucene `french_elision`'s default article set: a leading
    * `<article>'` strips from the token (`l'avion` → `avion`;
    * `aujourd'hui` keeps its non-article prefix). */
  val Articles: Seq[String] = Seq("l", "m", "t", "qu", "n", "s", "j",
    "d", "c", "jusqu", "quoiqu", "lorsqu", "puisqu")

  private val articleSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](32)
    Articles.foreach(s.add)
    s
  }

  /** Snowball's french stopword list (what ES loads as
    * `_french_` / Lucene's FrenchAnalyzer default set). Matched
    * after elision + lowercasing, before stemming. */
  val StopWords: Seq[String] = Seq(
    "au", "aux", "avec", "ce", "ces", "dans", "de", "des", "du",
    "elle", "en", "et", "eux", "il", "ils", "je", "la", "le", "les",
    "leur", "lui", "ma", "mais", "me", "même", "mes", "moi", "mon",
    "ne", "nos", "notre", "nous", "on", "ou", "par", "pas", "pour",
    "qu", "que", "qui", "sa", "se", "ses", "son", "sur", "ta", "te",
    "tes", "toi", "ton", "tu", "un", "une", "vos", "votre", "vous",
    "c", "d", "j", "l", "à", "m", "n", "s", "t", "y",
    "été", "étée", "étées", "étés", "étant", "suis", "es", "est",
    "sommes", "êtes", "sont", "serai", "seras", "sera", "serons",
    "serez", "seront", "serais", "serait", "serions", "seriez",
    "seraient", "étais", "était", "étions", "étiez", "étaient",
    "fus", "fut", "fûmes", "fûtes", "furent", "sois", "soit",
    "soyons", "soyez", "soient", "fusse", "fusses", "fût",
    "fussions", "fussiez", "fussent", "ayant", "eu", "eue", "eues",
    "eus", "ai", "as", "avons", "avez", "ont", "aurai", "auras",
    "aura", "aurons", "aurez", "auront", "aurais", "aurait",
    "aurions", "auriez", "auraient", "avais", "avait", "avions",
    "aviez", "avaient", "eut", "eûmes", "eûtes", "eurent", "aie",
    "aies", "ait", "ayons", "ayez", "aient", "eusse", "eusses",
    "eût", "eussions", "eussiez", "eussent", "ceci", "cela", "celà",
    "cet", "cette", "ici", "leurs", "quel", "quels", "quelle",
    "quelles", "sans", "soi")

  private val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](256)
    StopWords.foreach(s.add)
    s
  }

  def isStop(t: String): Boolean = stopSet.contains(t)

  /** `french_elision`: strip a leading article + apostrophe. The
    * tokenizer only admits word-INTERNAL apostrophes, so the
    * article, if any, ends at the token's FIRST apostrophe. */
  def elide(t: String): String = {
    val i = t.indexOf('\'')
    if (i > 0 && articleSet.contains(t.substring(0, i)))
      t.substring(i + 1)
    else t
  }

  /** Analyze query text with the full french chain — ES analyzes
    * the query with the same analyzer as the field. Duplicates kept
    * (callers distinct where ES does). */
  def analyze(s: String): Seq[String] =
    analyzeWithPositions(s).map(_._1)

  /** [[analyze]] keeping each surviving stem's ORIGINAL token
    * position — the stop filter consumes positions (Lucene's
    * enablePositionIncrements), exactly [[EnglishAnalysis]]'s
    * contract, so french phrases carry stop gaps. */
  def analyzeWithPositions(s: String): Seq[(String, Int)] =
    TextFunctions.analyzeText(s).iterator.zipWithIndex
      .map { case (t, i) => (elide(t), i) }
      .filter { case (t, _) => t.nonEmpty && !isStop(t) }
      .map { case (t, i) => (FrenchLightStemmer.stem(t), i) }
      .toSeq
}

package graft.functions

/** The engine's SPANISH analyzer chain — the FOURTH language chain
  * (standard tokenizer → lowercase → spanish stop filter → LIGHT
  * spanish stemmer), exactly ES 8.11's prebuilt `spanish` analyzer
  * (`lowercase → spanish_stop → spanish_stemmer`, where
  * `spanish_stemmer` defaults to `"light_spanish"` —
  * [[SpanishLightStemmer]], Savoy's published algorithm). No
  * elision (french), no normalization filter (german): the light
  * stemmer folds accented vowels itself on words long enough to
  * stem.
  *
  * QUERY-side (like english/french/german): documents stay
  * standard-analyzed, the stems search as literal terms against
  * standard tokens and statistics. The stop filter CONSUMES
  * positions (Lucene's increments), so spanish phrases carry gaps
  * where stopwords stood.
  */
object SpanishAnalysis {

  /** Snowball's spanish stopword list (what ES loads as `_spanish_`
    * / Lucene's SpanishAnalyzer default set): articles,
    * prepositions, pronouns and possessives, then the inflected
    * forms of estar / haber / ser / tener. Matched after
    * lowercasing, before stemming. */
  val StopWords: Seq[String] = Seq(
    "de", "la", "que", "el", "en", "y", "a", "los", "del", "se",
    "las", "por", "un", "para", "con", "no", "una", "su", "al",
    "lo", "como", "más", "pero", "sus", "le", "ya", "o", "este",
    "sí", "porque", "esta", "entre", "cuando", "muy", "sin",
    "sobre", "también", "me", "hasta", "hay", "donde", "quien",
    "desde", "todo", "nos", "durante", "todos", "uno", "les", "ni",
    "contra", "otros", "ese", "eso", "ante", "ellos", "e", "esto",
    "mí", "antes", "algunos", "qué", "unos", "yo", "otro", "otras",
    "otra", "él", "tanto", "esa", "estos", "mucho", "quienes",
    "nada", "muchos", "cual", "poco", "ella", "estar", "estas",
    "algunas", "algo", "nosotros", "mi", "mis", "tú", "te", "ti",
    "tu", "tus", "ellas", "nosotras", "vosotros", "vosotras", "os",
    "mío", "mía", "míos", "mías", "tuyo", "tuya", "tuyos", "tuyas",
    "suyo", "suya", "suyos", "suyas", "nuestro", "nuestra",
    "nuestros", "nuestras", "vuestro", "vuestra", "vuestros",
    "vuestras", "esos", "esas",
    // estar
    "estoy", "estás", "está", "estamos", "estáis", "están", "esté",
    "estés", "estemos", "estéis", "estén", "estaré", "estarás",
    "estará", "estaremos", "estaréis", "estarán", "estaría",
    "estarías", "estaríamos", "estaríais", "estarían", "estaba",
    "estabas", "estábamos", "estabais", "estaban", "estuve",
    "estuviste", "estuvo", "estuvimos", "estuvisteis", "estuvieron",
    "estuviera", "estuvieras", "estuviéramos", "estuvierais",
    "estuvieran", "estuviese", "estuvieses", "estuviésemos",
    "estuvieseis", "estuviesen", "estando", "estado", "estada",
    "estados", "estadas", "estad",
    // haber
    "he", "has", "ha", "hemos", "habéis", "han", "haya", "hayas",
    "hayamos", "hayáis", "hayan", "habré", "habrás", "habrá",
    "habremos", "habréis", "habrán", "habría", "habrías",
    "habríamos", "habríais", "habrían", "había", "habías",
    "habíamos", "habíais", "habían", "hube", "hubiste", "hubo",
    "hubimos", "hubisteis", "hubieron", "hubiera", "hubieras",
    "hubiéramos", "hubierais", "hubieran", "hubiese", "hubieses",
    "hubiésemos", "hubieseis", "hubiesen", "habiendo", "habido",
    "habida", "habidos", "habidas",
    // ser
    "soy", "eres", "es", "somos", "sois", "son", "sea", "seas",
    "seamos", "seáis", "sean", "seré", "serás", "será", "seremos",
    "seréis", "serán", "sería", "serías", "seríamos", "seríais",
    "serían", "era", "eras", "éramos", "erais", "eran", "fui",
    "fuiste", "fue", "fuimos", "fuisteis", "fueron", "fuera",
    "fueras", "fuéramos", "fuerais", "fueran", "fuese", "fueses",
    "fuésemos", "fueseis", "fuesen", "siendo", "sido",
    // tener
    "tengo", "tienes", "tiene", "tenemos", "tenéis", "tienen",
    "tenga", "tengas", "tengamos", "tengáis", "tengan", "tendré",
    "tendrás", "tendrá", "tendremos", "tendréis", "tendrán",
    "tendría", "tendrías", "tendríamos", "tendríais", "tendrían",
    "tenía", "tenías", "teníamos", "teníais", "tenían", "tuve",
    "tuviste", "tuvo", "tuvimos", "tuvisteis", "tuvieron",
    "tuviera", "tuvieras", "tuviéramos", "tuvierais", "tuvieran",
    "tuviese", "tuvieses", "tuviésemos", "tuvieseis", "tuviesen",
    "teniendo", "tenido", "tenida", "tenidos", "tenidas", "tened")

  private val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](512)
    StopWords.foreach(s.add)
    s
  }

  def isStop(t: String): Boolean = stopSet.contains(t)

  /** Analyze query text with the full spanish chain — ES analyzes
    * the query with the same analyzer as the field. Duplicates kept
    * (callers distinct where ES does). */
  def analyze(s: String): Seq[String] =
    analyzeWithPositions(s).map(_._1)

  /** [[analyze]] keeping each surviving stem's ORIGINAL token
    * position — the stop filter consumes positions (Lucene's
    * enablePositionIncrements), the same contract as the other
    * language chains, so spanish phrases carry stop gaps. */
  def analyzeWithPositions(s: String): Seq[(String, Int)] =
    TextFunctions.analyzeText(s).iterator.zipWithIndex
      .filter { case (t, _) => !isStop(t) }
      .map { case (t, i) => (SpanishLightStemmer.stem(t), i) }
      .toSeq
}

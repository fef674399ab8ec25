package graft.functions

/** The engine's GERMAN analyzer chain — the THIRD language chain,
  * proving the english/french plumbing is N-ary: standard tokenizer
  * → lowercase → german stop filter → german_normalization →
  * light german stemmer ([[GermanLightStemmer]]), exactly ES 8.11's
  * prebuilt `german` analyzer
  * (`lowercase → german_stop → german_normalization →
  * german_stemmer`, where `german_stemmer` defaults to
  * `"light_german"`). No elision (that is french); instead the
  * normalization filter folds ß→ss and the ae/oe/ue digraphs.
  *
  * QUERY-side (like english/french): documents stay
  * standard-analyzed, the stems search as literal terms against
  * standard tokens and statistics. The stop filter CONSUMES
  * positions (Lucene's increments), so german phrases carry gaps
  * where stopwords stood. Stopwords match BEFORE normalization
  * (Lucene's GermanAnalyzer order), so `daß` stops but `dass` does
  * not.
  */
object GermanAnalysis {

  /** Snowball's german stopword list (what ES loads as `_german_` /
    * Lucene's GermanAnalyzer default set). Matched after
    * lowercasing, before normalization and stemming. */
  val StopWords: Seq[String] = Seq(
    "aber", "alle", "allem", "allen", "aller", "alles", "als",
    "also", "am", "an", "ander", "andere", "anderem", "anderen",
    "anderer", "anderes", "anderm", "andern", "anderr", "anders",
    "auch", "auf", "aus", "bei", "bin", "bis", "bist", "da",
    "damit", "dann", "der", "den", "des", "dem", "die", "das",
    "daß", "derselbe", "derselben", "denselben", "desselben",
    "demselben", "dieselbe", "dieselben", "dasselbe", "dazu",
    "dein", "deine", "deinem", "deinen", "deiner", "deines",
    "denn", "derer", "dessen", "dich", "dir", "du", "dies",
    "diese", "diesem", "diesen", "dieser", "dieses", "doch",
    "dort", "durch", "ein", "eine", "einem", "einen", "einer",
    "eines", "einig", "einige", "einigem", "einigen", "einiger",
    "einiges", "einmal", "er", "ihn", "ihm", "es", "etwas",
    "euer", "eure", "eurem", "euren", "eurer", "eures", "für",
    "gegen", "gewesen", "hab", "habe", "haben", "hat", "hatte",
    "hatten", "hier", "hin", "hinter", "ich", "mich", "mir",
    "ihr", "ihre", "ihrem", "ihren", "ihrer", "ihres", "euch",
    "im", "in", "indem", "ins", "ist", "jede", "jedem", "jeden",
    "jeder", "jedes", "jene", "jenem", "jenen", "jener", "jenes",
    "jetzt", "kann", "kein", "keine", "keinem", "keinen",
    "keiner", "keines", "können", "könnte", "machen", "man",
    "manche", "manchem", "manchen", "mancher", "manches", "mein",
    "meine", "meinem", "meinen", "meiner", "meines", "mit",
    "muss", "musste", "nach", "nicht", "nichts", "noch", "nun",
    "nur", "ob", "oder", "ohne", "sehr", "sein", "seine",
    "seinem", "seinen", "seiner", "seines", "selbst", "sich",
    "sie", "ihnen", "sind", "so", "solche", "solchem", "solchen",
    "solcher", "solches", "soll", "sollte", "sondern", "sonst",
    "über", "um", "und", "uns", "unse", "unsem", "unsen",
    "unser", "unses", "unter", "viel", "vom", "von", "vor",
    "während", "war", "waren", "warst", "was", "weg", "weil",
    "weiter", "welche", "welchem", "welchen", "welcher",
    "welches", "wenn", "werde", "werden", "wie", "wieder",
    "will", "wir", "wird", "wirst", "wo", "wollen", "wollte",
    "würde", "würden", "zu", "zum", "zur", "zwar", "zwischen")

  private val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](512)
    StopWords.foreach(s.add)
    s
  }

  def isStop(t: String): Boolean = stopSet.contains(t)

  /** ES's `german_normalization` token filter (Lucene's
    * GermanNormalizationFilter): ß → ss; ä/ö/ü fold to a/o/u; the
    * digraphs ae/oe/ue drop the e — EXCEPT a `ue` whose u follows
    * a vowel or q (so `quelle`, `aue` keep their e). One forward
    * state machine: N = neutral, V = just saw a vowel/q (a
    * following u is NOT a digraph head), U = just saw a digraph
    * head (a/o, or u from neutral). */
  def normalize(t: String): String = {
    val N = 0; val V = 1; val U = 2
    val sb = new java.lang.StringBuilder(t.length + 4)
    var state = N
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      c match {
        case 'a' | 'o' =>
          sb.append(c); state = U
        case 'u' =>
          sb.append(c); state = if (state == N) U else V
        case 'e' =>
          // after a digraph head (ae/oe/ue) THIS e drops — the
          // head letter stays; elsewhere the e is ordinary
          if (state != U) sb.append(c)
          state = V
        case 'i' | 'q' | 'y' =>
          sb.append(c); state = V
        case 'ä' => sb.append('a'); state = V
        case 'ö' => sb.append('o'); state = V
        case 'ü' => sb.append('u'); state = V
        case 'ß' => sb.append("ss"); state = N
        case other => sb.append(other); state = N
      }
      i += 1
    }
    sb.toString
  }

  /** Analyze query text with the full german chain — ES analyzes
    * the query with the same analyzer as the field. Duplicates kept
    * (callers distinct where ES does). */
  def analyze(s: String): Seq[String] =
    analyzeWithPositions(s).map(_._1)

  /** [[analyze]] keeping each surviving stem's ORIGINAL token
    * position — the stop filter consumes positions (Lucene's
    * enablePositionIncrements), the same contract as
    * [[EnglishAnalysis]]/[[FrenchAnalysis]], so german phrases
    * carry stop gaps. */
  def analyzeWithPositions(s: String): Seq[(String, Int)] =
    TextFunctions.analyzeText(s).iterator.zipWithIndex
      .filter { case (t, _) => !isStop(t) }
      .map { case (t, i) =>
        (GermanLightStemmer.stem(normalize(t)), i)
      }
      .toSeq
}

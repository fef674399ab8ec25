package graft.functions

/** Light Spanish stemmer — Savoy's published algorithm ("Report and
  * Evaluation of the CLEF-2005 Evaluation Campaign" line of light
  * stemmers, SAC 2006), the algorithm Lucene ships as
  * `SpanishLightStemFilter` and what ES 8.11's prebuilt `spanish`
  * analyzer stems with (its `spanish_stemmer` filter defaults to
  * `"light_spanish"` — the reference passes bodies verbatim to that
  * ES, src/search_api.py:38-46, docker-compose.yml:5).
  *
  * The whole algorithm: words shorter than 5 characters pass
  * through untouched (accents kept); longer words first fold the
  * accented vowels to their base letters, then strip ONE final
  * vowel (-o/-a/-e), or a plural tail: -os/-as/-es drop both
  * letters, with two refinements — `-eses` → `-es` (franceses →
  * frances) and `-ces` → `-z` (veces → vez). Everything else is
  * left whole — the "light" in light stemming. */
object SpanishLightStemmer {

  def stem(word: String): String = {
    val len = word.length
    if (len < 5) return word
    val s = new Array[Char](len)
    var i = 0
    while (i < len) {
      s(i) = word.charAt(i) match {
        case 'à' | 'á' | 'â' | 'ä' => 'a'
        case 'ò' | 'ó' | 'ô' | 'ö' => 'o'
        case 'è' | 'é' | 'ê' | 'ë' => 'e'
        case 'ù' | 'ú' | 'û' | 'ü' => 'u'
        case 'ì' | 'í' | 'î' | 'ï' => 'i'
        case c => c
      }
      i += 1
    }
    s(len - 1) match {
      case 'o' | 'a' | 'e' => new String(s, 0, len - 1)
      case 's' =>
        if (s(len - 2) == 'e' && s(len - 3) == 's' && s(len - 4) == 'e')
          new String(s, 0, len - 2)
        else if (s(len - 2) == 'e' && s(len - 3) == 'c') {
          s(len - 3) = 'z'
          new String(s, 0, len - 2)
        } else if (s(len - 2) == 'o' || s(len - 2) == 'a' ||
                   s(len - 2) == 'e')
          new String(s, 0, len - 2)
        else new String(s, 0, len)
      case _ => new String(s, 0, len)
    }
  }
}

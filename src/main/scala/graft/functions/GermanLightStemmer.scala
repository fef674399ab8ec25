package graft.functions

/** Savoy's LIGHT GERMAN stemmer — the published algorithm from
  * Jacques Savoy, "Light Stemming Approaches for the French,
  * Portuguese, German and Hungarian Languages" (ACM SAC 2006), with
  * the rule order and length guards Lucene ships as
  * `GermanLightStemFilter` — what ES's prebuilt `german` analyzer
  * stems with (its `german_stemmer` filter defaults to
  * `"light_german"`). The third language chain
  * ([[GermanAnalysis]]), after english and french.
  *
  * Shape: an umlaut/accent fold, then two ordered suffix steps.
  * Step 1 strips the plural/case endings `-ern`, `-em/-en/-er/-es`,
  * `-e`, and `-s` (the s only after one of the "st-endings"
  * b d f g h k l m n t — the consonants German plural-s follows);
  * step 2 strips the superlative/inflection endings `-est`,
  * `-er/-en`, and `-st` (again st-ending-guarded). No minimum-stem
  * machinery beyond the per-rule length guards — light means light.
  *
  * Input must already be lowercase; [[GermanAnalysis]] additionally
  * runs ES's `german_normalization` (ß→ss, ae/oe/ue folds) BEFORE
  * stemming, as the prebuilt chain does. Single pass, no allocation
  * beyond the working buffer, callable from codegen'd expressions. */
object GermanLightStemmer {

  /** The consonants a strippable `-s` / `-st` may follow. */
  private def stEnding(c: Char): Boolean = c match {
    case 'b' | 'd' | 'f' | 'g' | 'h' | 'k' | 'l' | 'm' | 'n' | 't' =>
      true
    case _ => false
  }

  def stem(input: String): String = {
    val s = input.toCharArray
    var len = s.length

    // fold umlauts and accented vowels first (the stemmer's own
    // fold — the chain's german_normalization already handled the
    // ä/ö/ü it sees, but the stemmer stays self-contained)
    var i = 0
    while (i < len) {
      s(i) match {
        case 'ä' | 'à' | 'á' | 'â' => s(i) = 'a'
        case 'ö' | 'ò' | 'ó' | 'ô' => s(i) = 'o'
        case 'ï' | 'ì' | 'í' | 'î' => s(i) = 'i'
        case 'ü' | 'ù' | 'ú' | 'û' => s(i) = 'u'
        case _                     =>
      }
      i += 1
    }

    // step 1: plural / case endings
    if (len > 5 && s(len - 3) == 'e' && s(len - 2) == 'r' &&
        s(len - 1) == 'n')
      len -= 3                                    // -ern
    else if (len > 4 && s(len - 2) == 'e' &&
        (s(len - 1) == 'm' || s(len - 1) == 'n' ||
         s(len - 1) == 'r' || s(len - 1) == 's'))
      len -= 2                                    // -em/-en/-er/-es
    else if (len > 3 && s(len - 1) == 'e')
      len -= 1                                    // -e
    else if (len > 3 && s(len - 1) == 's' && stEnding(s(len - 2)))
      len -= 1                                    // -s after st-ending

    // step 2: superlative / inflection endings
    if (len > 5 && s(len - 3) == 'e' && s(len - 2) == 's' &&
        s(len - 1) == 't')
      len -= 3                                    // -est
    else if (len > 4 && s(len - 2) == 'e' &&
        (s(len - 1) == 'r' || s(len - 1) == 'n'))
      len -= 2                                    // -er/-en
    else if (len > 4 && s(len - 2) == 's' && s(len - 1) == 't' &&
        stEnding(s(len - 3)))
      len -= 2                                    // -st after st-ending

    new String(s, 0, len)
  }
}

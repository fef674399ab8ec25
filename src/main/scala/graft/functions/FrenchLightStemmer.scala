package graft.functions

/** Savoy's LIGHT FRENCH stemmer — the published algorithm from
  * Jacques Savoy, "Light Stemming Approaches for the French,
  * Portuguese, German and Hungarian Languages" (ACM SAC 2006), in
  * the exact rule order and with the exact length guards Lucene
  * ships as `FrenchLightStemFilter` — which is what ES's prebuilt
  * `french` analyzer stems with (its `french_stemmer` filter
  * defaults to `"light_french"`). Routing the engine's prebuilt
  * `french` chain here closes the last place a verbatim ES body
  * answered differently than ES 8.11: the heavier Snowball
  * algorithm stays available as [[FrenchStemmer]], exactly the
  * `stemmer: "french"` token-filter form it is in ES.
  *
  * Shape: one ordered pass of suffix rules (plural x/s strips,
  * the `aux→al` regularization, agent/action noun families like
  * `ateur/atrice/ation`, verb families `issement/issant/ement`,
  * adjective families `ique/euse/ive/ète/ère`), most of which end
  * in a shared normalization (`norm`): accent folding, in-word
  * letter de-doubling, and a final `ie`/`r`/`e`/double-letter
  * strip — all gated on minimum lengths so short words pass
  * through untouched. Input must already be lowercase (the
  * analyzer chain lowercases before stemming).
  *
  * Like [[PorterStemmer]] and [[FrenchStemmer]]: a single pass over
  * a working buffer, no allocation beyond it, callable from
  * codegen'd expressions. */
object FrenchLightStemmer {

  /** Working state: a char buffer and a logical length — rules only
    * ever shorten or patch in place, so the buffer never grows
    * beyond the input (except ß-free french never needs to). */
  private final class Buf(word: String) {
    val s: Array[Char] = word.toCharArray
    var len: Int = s.length

    def ends(suffix: String): Boolean = {
      val n = suffix.length
      if (len < n) return false
      var i = 0
      while (i < n) {
        if (s(len - n + i) != suffix.charAt(i)) return false
        i += 1
      }
      true
    }

    /** Remove the char at `i`, shifting the tail left. */
    def deleteAt(i: Int): Unit = {
      var j = i
      while (j < len - 1) { s(j) = s(j + 1); j += 1 }
      len -= 1
    }

    def result: String = new String(s, 0, len)
  }

  /** The shared normalization tail: accent-fold, de-double
    * consecutive letters, strip final `ie`, then up to one each of
    * trailing `r`, `e`, `e`, and a doubled last letter — each phase
    * gated on length > 4 (checked once per phase, as published). */
  private def norm(b: Buf): Unit = {
    if (b.len > 4) {
      var i = 0
      while (i < b.len) {
        b.s(i) match {
          case 'à' | 'á' | 'â' => b.s(i) = 'a'
          case 'ô'             => b.s(i) = 'o'
          case 'è' | 'é' | 'ê' => b.s(i) = 'e'
          case 'ù' | 'û'       => b.s(i) = 'u'
          case 'î'             => b.s(i) = 'i'
          case 'ç'             => b.s(i) = 'c'
          case _               =>
        }
        i += 1
      }
      // collapse runs of the same letter anywhere in the word
      var ch = b.s(0)
      i = 1
      while (i < b.len) {
        if (b.s(i) == ch && Character.isLetter(ch)) {
          b.deleteAt(i)
          i -= 1
        } else ch = b.s(i)
        i += 1
      }
    }
    if (b.len > 4 && b.ends("ie")) b.len -= 2
    if (b.len > 4) {
      if (b.s(b.len - 1) == 'r') b.len -= 1
      if (b.s(b.len - 1) == 'e') b.len -= 1
      if (b.s(b.len - 1) == 'e') b.len -= 1
      if (b.s(b.len - 1) == b.s(b.len - 2) &&
          Character.isLetter(b.s(b.len - 1))) b.len -= 1
    }
  }

  def stem(input: String): String = {
    val b = new Buf(input)

    // plural / x strips: chevaux→cheval (but eaux→eau), choux→chou
    if (b.len > 5 && b.s(b.len - 1) == 'x') {
      if (b.s(b.len - 3) == 'a' && b.s(b.len - 2) == 'u' &&
          b.s(b.len - 4) != 'e')
        b.s(b.len - 2) = 'l'
      b.len -= 1
    }
    if (b.len > 3 && b.s(b.len - 1) == 'x') b.len -= 1
    if (b.len > 3 && b.s(b.len - 1) == 's') b.len -= 1

    // verb-noun families ending in norm() directly
    if (b.len > 9 && b.ends("issement")) {
      b.len -= 6; b.s(b.len - 1) = 'r'           // -issement → -ir
      norm(b); return b.result
    }
    if (b.len > 8 && b.ends("issant")) {
      b.len -= 4; b.s(b.len - 1) = 'r'           // -issant → -ir
      norm(b); return b.result
    }
    if (b.len > 6 && b.ends("ement")) {
      b.len -= 4                                 // -ement → -e…
      if (b.len > 3 && b.ends("ive")) {          // -ivement → -if
        b.len -= 1; b.s(b.len - 1) = 'f'
      }
      norm(b); return b.result
    }
    if (b.len > 11 && b.ends("ficatrice")) {
      b.len -= 5; b.s(b.len - 2) = 'e'; b.s(b.len - 1) = 'r'
      norm(b); return b.result
    }
    if (b.len > 10 && b.ends("ficateur")) {
      b.len -= 4; b.s(b.len - 2) = 'e'; b.s(b.len - 1) = 'r'
      norm(b); return b.result
    }
    if (b.len > 9 && b.ends("catrice")) {
      b.len -= 3
      b.s(b.len - 4) = 'q'; b.s(b.len - 3) = 'u'
      b.s(b.len - 2) = 'e'                       // (-1 already 'r')
      norm(b); return b.result
    }
    if (b.len > 8 && b.ends("cateur")) {
      b.len -= 2
      b.s(b.len - 4) = 'q'; b.s(b.len - 3) = 'u'
      b.s(b.len - 2) = 'e'; b.s(b.len - 1) = 'r'
      norm(b); return b.result
    }
    if (b.len > 8 && b.ends("atrice")) {
      b.len -= 4; b.s(b.len - 2) = 'e'; b.s(b.len - 1) = 'r'
      norm(b); return b.result
    }
    if (b.len > 7 && b.ends("ateur")) {
      b.len -= 3; b.s(b.len - 2) = 'e'; b.s(b.len - 1) = 'r'
      norm(b); return b.result
    }
    // -trice → -teur, then fall THROUGH to the remaining rules
    if (b.len > 6 && b.ends("trice")) {
      b.len -= 1
      b.s(b.len - 3) = 'e'; b.s(b.len - 2) = 'u'; b.s(b.len - 1) = 'r'
    }
    if (b.len > 5 && b.ends("ième")) {
      b.len -= 4; norm(b); return b.result
    }
    if (b.len > 7 && b.ends("teuse")) {
      b.len -= 2; b.s(b.len - 1) = 'r'           // -teuse → -teur
      norm(b); return b.result
    }
    if (b.len > 6 && b.ends("teur")) {
      b.len -= 1; b.s(b.len - 1) = 'r'
      norm(b); return b.result
    }
    if (b.len > 5 && b.ends("euse")) {
      b.len -= 2; norm(b); return b.result
    }
    if (b.len > 8 && b.ends("ère")) {
      b.len -= 1; b.s(b.len - 2) = 'e'           // -ère → -er
      norm(b); return b.result
    }
    if (b.len > 7 && b.ends("ive")) {
      b.len -= 1; b.s(b.len - 1) = 'f'           // -ive → -if
      norm(b); return b.result
    }
    if (b.len > 4 && (b.ends("folle") || b.ends("molle"))) {
      b.len -= 2; b.s(b.len - 1) = 'u'           // folle → fou
      norm(b); return b.result
    }
    if (b.len > 9 && b.ends("nnelle")) {
      b.len -= 5; norm(b); return b.result
    }
    if (b.len > 9 && b.ends("nnel")) {
      b.len -= 3; norm(b); return b.result
    }
    // -ète → -et, falls through
    if (b.len > 4 && b.ends("ète")) {
      b.len -= 1; b.s(b.len - 2) = 'e'
    }
    // -ique strip, falls through
    if (b.len > 8 && b.ends("ique")) b.len -= 4
    if (b.len > 8 && b.ends("esse")) {
      b.len -= 3; norm(b); return b.result
    }
    if (b.len > 7 && b.ends("inage")) {
      b.len -= 3; norm(b); return b.result
    }
    if (b.len > 9 && b.ends("isation")) {
      b.len -= 7
      if (b.len > 5 && b.ends("ual")) b.s(b.len - 2) = 'e'
      norm(b); return b.result
    }
    if (b.len > 9 && b.ends("isateur")) {
      b.len -= 7; norm(b); return b.result
    }
    if (b.len > 8 && b.ends("ation")) {
      b.len -= 5; norm(b); return b.result
    }
    if (b.len > 8 && b.ends("ition")) {
      b.len -= 5; norm(b); return b.result
    }

    norm(b)
    b.result
  }
}

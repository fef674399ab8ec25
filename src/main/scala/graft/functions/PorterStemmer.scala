package graft.functions

/** Martin Porter's suffix-stripping algorithm ("An algorithm for
  * suffix stripping", Program 14(3), 1980) — the stemming stage of
  * Elasticsearch's `english` analyzer (standard tokenizer →
  * possessive stemmer → lowercase → stop filter → PorterStemFilter;
  * the reference's ES 8.11 stack runs exactly that chain when a
  * verbatim DSL body selects `"analyzer": "english"` —
  * src/search_api.py:38-46 forwards such bodies untouched).
  *
  * This is a from-scratch implementation of the published algorithm
  * plus the two departures of the author's maintained reference code
  * (which Lucene's PorterStemFilter ports): BLI -> BLE replacing
  * ABLI -> ABLE, and LOGI -> LOG — see the Step2 table. Words of
  * length ≤ 2 are returned unchanged (the reference implementation's
  * guard). [[PorterStemmerSpec]] pins end-to-end vectors, the paper's
  * per-step examples and the departure pairs.
  *
  * Called per query term from driver-side query analysis
  * ([[EnglishAnalysis.analyze]]) — query-time-analyzer semantics stem
  * ONLY the query, never the documents, so there is no per-row
  * stemming expression. Allocation-light: suffix tables, no regex.
  */
object PorterStemmer {

  /** A letter is a consonant unless it is a/e/i/o/u, or a `y`
    * preceded by a consonant (paper §2: "a consonant is a letter
    * other than A, E, I, O or U, and other than Y preceded by a
    * consonant"). `y` at position 0 has no predecessor → consonant. */
  private def isCons(w: CharSequence, i: Int): Boolean =
    w.charAt(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => i == 0 || !isCons(w, i - 1)
      case _ => true
    }

  /** The measure m of w[0, end): the number of VC sequences in the
    * form [C](VC)^m[V]. */
  private def measure(w: CharSequence, end: Int): Int = {
    var m = 0
    var i = 0
    while (i < end && isCons(w, i)) i += 1
    while (i < end) {
      while (i < end && !isCons(w, i)) i += 1
      if (i < end) {
        m += 1
        while (i < end && isCons(w, i)) i += 1
      }
    }
    m
  }

  private def containsVowel(w: CharSequence, end: Int): Boolean = {
    var i = 0
    while (i < end) {
      if (!isCons(w, i)) return true
      i += 1
    }
    false
  }

  /** *d — ends with a double consonant. */
  private def endsDoubleCons(w: CharSequence): Boolean = {
    val n = w.length
    n >= 2 && w.charAt(n - 1) == w.charAt(n - 2) && isCons(w, n - 1)
  }

  /** *o — ends consonant-vowel-consonant where the final consonant is
    * not w, x or y. */
  private def endsCvc(w: CharSequence, end: Int): Boolean = {
    if (end < 3) return false
    val c = w.charAt(end - 1)
    isCons(w, end - 3) && !isCons(w, end - 2) && isCons(w, end - 1) &&
      c != 'w' && c != 'x' && c != 'y'
  }

  // Steps 2-4 rule tables: (suffix, replacement), first matching
  // suffix wins and — as in the reference implementation, which
  // switches on the penultimate letter — a matched suffix whose m
  // condition fails ends the step without trying shorter suffixes.
  // Within each table, no listed suffix is a proper suffix of a later
  // one, so first-match ≡ longest-match here.
  //
  // Two DEPARTURES from the 1980 paper, matching Martin Porter's
  // maintained reference code (and therefore Lucene's
  // PorterStemFilter — the stemmer ES's `english` analyzer runs):
  // the paper's (m>0) ABLI -> ABLE is replaced by (m>0) BLI -> BLE
  // ("possibly" -> "possibl", conflating with "possible"), and
  // (m>0) LOGI -> LOG is added. PorterStemmerSpec pins both.
  private val Step2: Array[(String, String)] = Array(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
    "anci" -> "ance", "izer" -> "ize", "bli" -> "ble",
    "alli" -> "al", "entli" -> "ent", "eli" -> "e", "ousli" -> "ous",
    "ization" -> "ize", "ation" -> "ate", "ator" -> "ate",
    "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive",
    "biliti" -> "ble", "logi" -> "log")

  private val Step3: Array[(String, String)] = Array(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  // "ion" carries the extra stem-ends-in-s-or-t condition, handled
  // inline in step4.
  private val Step4: Array[String] = Array(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant",
    "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
    "ous", "ive", "ize")

  /** Stem an already-lowercased word. Not thread-shared state — safe
    * for concurrent per-row calls from generated code. */
  def stem(word: String): String = {
    if (word.length <= 2) return word
    var w = word

    def ends(s: String): Boolean = w.endsWith(s)
    def chop(n: Int): String = w.substring(0, w.length - n)
    def m(s: String): Int = measure(s, s.length)

    // Step 1a: plurals
    if (ends("sses")) w = chop(2)
    else if (ends("ies")) w = chop(2)
    else if (!ends("ss") && ends("s")) w = chop(1)

    // Step 1b: -ed / -ing
    var cleanup = false
    if (ends("eed")) {
      if (m(chop(3)) > 0) w = chop(1)
    } else if (ends("ed") && containsVowel(w, w.length - 2)) {
      w = chop(2); cleanup = true
    } else if (ends("ing") && containsVowel(w, w.length - 3)) {
      w = chop(3); cleanup = true
    }
    if (cleanup) {
      if (ends("at") || ends("bl") || ends("iz")) w = w + "e"
      else if (endsDoubleCons(w) &&
               !ends("l") && !ends("s") && !ends("z")) w = chop(1)
      else if (m(w) == 1 && endsCvc(w, w.length)) w = w + "e"
    }

    // Step 1c: y → i when the stem has a vowel
    if (ends("y") && containsVowel(w, w.length - 1)) w = chop(1) + "i"

    // Steps 2 and 3: double-suffix reductions, m(stem) > 0
    def rewrite(rules: Array[(String, String)]): Unit = {
      var i = 0
      var done = false
      while (i < rules.length && !done) {
        val (suf, rep) = rules(i)
        if (ends(suf)) {
          done = true
          val st = chop(suf.length)
          if (m(st) > 0) w = st + rep
        }
        i += 1
      }
    }
    rewrite(Step2)
    rewrite(Step3)

    // Step 4: single-suffix removal, m(stem) > 1
    {
      var i = 0
      var done = false
      while (i < Step4.length && !done) {
        val suf = Step4(i)
        if (ends(suf)) {
          done = true
          val stem = chop(suf.length)
          val ionOk = suf != "ion" ||
            (stem.nonEmpty &&
              (stem.charAt(stem.length - 1) == 's' ||
               stem.charAt(stem.length - 1) == 't'))
          if (m(stem) > 1 && ionOk) w = stem
        }
        i += 1
      }
    }

    // Step 5a: final -e
    if (ends("e")) {
      val stem = chop(1)
      val a = m(stem)
      if (a > 1 || (a == 1 && !endsCvc(stem, stem.length))) w = stem
    }
    // Step 5b: -ll → -l when m > 1
    if (measure(w, w.length) > 1 && endsDoubleCons(w) && ends("l"))
      w = chop(1)

    w
  }
}

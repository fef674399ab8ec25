package graft.functions

/** The Snowball FRENCH stemmer — the published algorithm from the
  * Snowball project (snowball.tartarus.org/algorithms/french), the
  * same algorithm Lucene ships as `FrenchStemmer` and ES exposes as
  * the `stemmer` token filter's `"french"` language (ES's prebuilt
  * `french` ANALYZER defaults to the lighter `light_french`
  * [Savoy's light stemmer]; this engine's french chain uses the
  * Snowball variant — a DOCUMENTED choice, pinned by the spec's
  * golden vectors, so the chain is exactly ES's
  * `elision → lowercase → french_stop → stemmer("french")`).
  *
  * Implemented from the published specification, like
  * [[PorterStemmer]]: single pass, no allocation beyond the working
  * buffer, callable from codegen'd expressions. Input must be
  * lowercase (the analyzer chain lowercases before stemming).
  *
  * Shape of the algorithm: a marking prelude (u/i between vowels,
  * y beside a vowel, and u after q become consonant-marked U/I/Y),
  * the standard Snowball regions RV/R1/R2, a longest-match standard
  * suffix step, the i-verb and other-verb suffix steps, residual
  * suffix cleanup, undoubling (enn/onn/ett/ell/eill) and
  * un-accenting (é|è + trailing non-vowels → e), then unmarking. */
object FrenchStemmer {

  private val Vowels = "aeiouyâàëéêèïîôûù"

  private def isVowel(c: Char): Boolean = Vowels.indexOf(c.toInt) >= 0

  /** Prelude: mark non-syllabic u/i/y as consonants, left to right,
    * each test seeing the marks already made to its left (the
    * Snowball program's single forward pass). */
  private def mark(s: String): Array[Char] = {
    val b = s.toCharArray
    var i = 0
    while (i < b.length) {
      val c = b(i)
      val prevV = i > 0 && isVowel(b(i - 1))
      val nextV = i + 1 < b.length && isVowel(b(i + 1))
      if ((c == 'u' || c == 'i') && prevV && nextV)
        b(i) = c.toUpper
      else if (c == 'y' && (prevV || nextV)) b(i) = 'Y'
      else if (c == 'u' && i > 0 && b(i - 1) == 'q') b(i) = 'U'
      i += 1
    }
    b
  }

  /** RV: after the third letter when the word starts with two vowels
    * or with par/col/tap; otherwise after the first vowel not at the
    * start; otherwise the end. */
  private def rvOf(b: Array[Char]): Int = {
    if (b.length >= 2 && isVowel(b(0)) && isVowel(b(1)))
      return math.min(3, b.length)
    val head = new String(b, 0, math.min(3, b.length))
    if (head == "par" || head == "col" || head == "tap") return 3
    var i = 1
    while (i < b.length) {
      if (isVowel(b(i))) return i + 1
      i += 1
    }
    b.length
  }

  /** Standard Snowball R1/R2: the region after the first non-vowel
    * following a vowel (scanning from `from`). */
  private def r1Of(b: Array[Char], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (isVowel(b(i)) && !isVowel(b(i + 1))) return i + 2
      i += 1
    }
    b.length
  }

  // Longest-first suffix tables. Group tags select the rule to apply
  // to the ONE longest textual match — Snowball `among` semantics: a
  // matched suffix whose condition fails ends the step with no
  // change (shorter suffixes are NOT retried).
  private val Step1: Array[(String, Int)] = Array(
    "issements" -> 12, "issement" -> 12,
    "atrices" -> 2, "amment" -> 13, "emment" -> 14,
    "logies" -> 3, "usions" -> 4, "utions" -> 4, "ements" -> 6,
    "atrice" -> 2, "ations" -> 2, "ateurs" -> 2,
    "ances" -> 1, "iqUes" -> 1, "ismes" -> 1, "ables" -> 1,
    "istes" -> 1, "ateur" -> 2, "ation" -> 2, "logie" -> 3,
    "usion" -> 4, "ution" -> 4, "ences" -> 5, "ement" -> 6,
    "euses" -> 11, "ments" -> 15,
    "ance" -> 1, "iqUe" -> 1, "isme" -> 1, "able" -> 1, "iste" -> 1,
    "ence" -> 5, "ités" -> 7, "ives" -> 8, "eaux" -> 9, "euse" -> 11,
    "ment" -> 15,
    "eux" -> 1, "ité" -> 7, "ive" -> 8, "ifs" -> 8, "aux" -> 10,
    "if" -> 8).sortBy(-_._1.length)

  private val Step2a: Array[String] = Array(
    "issaIent", "issantes", "iraIent", "issante", "issants",
    "issions", "irions", "issais", "issait", "issant", "issent",
    "issiez", "issons", "irais", "irait", "irent", "iriez", "irons",
    "iront", "isses", "issez", "îmes", "îtes", "irai", "iras",
    "irez", "isse", "ies", "ira", "ît", "ie", "ir", "is", "it",
    "i").sortBy(-_.length)

  private val Step2bEr: Array[String] = Array(
    "eraIent", "erions", "èrent", "erais", "erait", "eriez",
    "erons", "eront", "erai", "eras", "erez", "ées", "era", "iez",
    "ée", "és", "er", "ez", "é").sortBy(-_.length)

  private val Step2bA: Array[String] = Array(
    "assions", "assent", "assiez", "aIent", "antes", "asses",
    "âmes", "âtes", "ante", "ants", "asse", "ais", "ait", "ant",
    "ât", "ai", "as", "a").sortBy(-_.length)

  def stem(input: String): String = {
    if (input.length < 2) return input
    val marked = mark(input)
    val rv = rvOf(marked)
    val r1 = r1Of(marked, 0)
    val r2 = r1Of(marked, r1)
    var b = new String(marked)

    def ends(suf: String): Boolean = b.endsWith(suf)
    // suffix (or any position from its start) inside a region whose
    // start index was fixed on the UNSHRUNK word — suffix removal
    // only shortens the right edge, so region starts stay valid
    def inRegion(region: Int, suf: String): Boolean =
      ends(suf) && b.length - suf.length >= region
    def del(n: Int): Unit = b = b.substring(0, b.length - n)
    def rep(sufLen: Int, by: String): Unit =
      b = b.substring(0, b.length - sufLen) + by

    var changed = false
    var mentFound = false

    // ---- step 1: standard suffix removal -----------------------------
    val m1 = Step1.find { case (suf, _) => ends(suf) }
    m1.foreach { case (suf, g) =>
      val before = b
      g match {
        case 1 => // ance/iqUe/isme/able/iste/eux (+ plurals)
          if (inRegion(r2, suf)) del(suf.length)
        case 2 => // atrice/ateur/ation (+ plurals), then ic
          if (inRegion(r2, suf)) {
            del(suf.length)
            if (ends("ic")) {
              if (inRegion(r2, "ic")) del(2) else rep(2, "iqU")
            }
          }
        case 3 => if (inRegion(r2, suf)) rep(suf.length, "log")
        case 4 => if (inRegion(r2, suf)) rep(suf.length, "u")
        case 5 => if (inRegion(r2, suf)) rep(suf.length, "ent")
        case 6 => // ement(s), then the residual prefixes
          if (inRegion(rv, suf)) {
            del(suf.length)
            if (inRegion(r2, "iv")) {
              del(2)
              if (inRegion(r2, "at")) del(2)
            } else if (ends("eus")) {
              if (inRegion(r2, "eus")) del(3)
              else if (inRegion(r1, "eus")) rep(3, "eux")
            } else if (inRegion(r2, "abl") || inRegion(r2, "iqU"))
              del(3)
            else if (inRegion(rv, "ièr") || inRegion(rv, "Ièr"))
              rep(3, "i")
          }
        case 7 => // ité(s), then abil/ic/iv
          if (inRegion(r2, suf)) {
            del(suf.length)
            if (ends("abil")) {
              if (inRegion(r2, "abil")) del(4) else rep(4, "abl")
            } else if (ends("ic")) {
              if (inRegion(r2, "ic")) del(2) else rep(2, "iqU")
            } else if (inRegion(r2, "iv")) del(2)
          }
        case 8 => // if/ive (+ plurals), then at/ic
          if (inRegion(r2, suf)) {
            del(suf.length)
            if (inRegion(r2, "at")) {
              del(2)
              if (ends("ic")) {
                if (inRegion(r2, "ic")) del(2) else rep(2, "iqU")
              }
            }
          }
        case 9  => rep(4, "eau") // eaux, unconditional
        case 10 => if (inRegion(r1, suf)) rep(suf.length, "al") // aux
        case 11 => // euse(s): R2 delete, else R1 -> eux
          if (inRegion(r2, suf)) del(suf.length)
          else if (inRegion(r1, suf)) rep(suf.length, "eux")
        case 12 => // issement(s): R1 delete when preceded by non-vowel
          if (inRegion(r1, suf) && b.length > suf.length &&
              !isVowel(b.charAt(b.length - suf.length - 1)))
            del(suf.length)
        case 13 => // amment -> ant in RV
          mentFound = true
          if (inRegion(rv, suf)) rep(suf.length, "ant")
        case 14 => // emment -> ent in RV
          mentFound = true
          if (inRegion(rv, suf)) rep(suf.length, "ent")
        case 15 => // ment(s): delete when preceded by a vowel in RV
          mentFound = true
          val p = b.length - suf.length - 1
          if (p >= rv && p >= 0 && isVowel(b.charAt(p)))
            del(suf.length)
      }
      changed = b != before
    }
    val step1Changed = changed

    // ---- steps 2a/2b: verb suffixes (tests confined to RV) -----------
    var step2Changed = false
    if (!step1Changed || mentFound) {
      val m2a = Step2a.find(ends)
      val removed2a = m2a.exists { suf =>
        val p = b.length - suf.length - 1
        if (b.length - suf.length >= rv && p >= rv &&
            !isVowel(b.charAt(p))) { del(suf.length); true }
        else false
      }
      step2Changed = removed2a
      if (!removed2a) {
        // step 2b: longest among ALL THREE groups decides the rule
        val all = (Step2bEr.map(_ -> 1) ++ Step2bA.map(_ -> 2) ++
          Array("ions" -> 3)).sortBy(-_._1.length)
        all.find { case (suf, _) => ends(suf) }.foreach {
          case (suf, 1) =>
            if (inRegion(rv, suf)) { del(suf.length); step2Changed = true }
          case (suf, 2) =>
            if (inRegion(rv, suf)) {
              del(suf.length); step2Changed = true
              if (b.nonEmpty && b.charAt(b.length - 1) == 'e' &&
                  b.length - 1 >= rv) del(1)
            }
          case (suf, _) =>
            if (inRegion(r2, suf)) { del(suf.length); step2Changed = true }
        }
      }
    }
    // Success of the combined suffix phase (the Snowball program's
    // `standard_suffix or i_verb_suffix or verb_suffix`): a
    // ment/amment/emment match FAILS standard_suffix by construction
    // (its entries end in `fail` — that is how "do 2a when ment was
    // found" is implemented), so a ment-family alteration alone never
    // selects step 3; the verb steps must land, else the residual
    // step runs ("ambiguëment" → ment drops → 2a/2b fail → residual's
    // guë-rule → "ambigu", not "ambiguë").
    changed = (step1Changed && !mentFound) || step2Changed

    // ---- step 3 (suffix phase landed) or step 4 (it failed) ----------
    if (changed) {
      if (b.nonEmpty && b.charAt(b.length - 1) == 'Y') rep(1, "i")
      else if (b.nonEmpty && b.charAt(b.length - 1) == 'ç') rep(1, "c")
    } else {
      // step 4: residual suffixes
      if (b.length >= 2 && b.charAt(b.length - 1) == 's' &&
          "aiouèsx".indexOf(b.charAt(b.length - 2).toInt) < 0)
        del(1)
      val res = Array("ière", "Ière", "ion", "ier", "Ier", "ë", "e")
        .sortBy(-_.length)
      res.find(ends).foreach {
        case "ion" =>
          val p = b.length - 4
          if (inRegion(r2, "ion") && b.length - 3 >= rv && p >= rv &&
              (b.charAt(p) == 's' || b.charAt(p) == 't')) del(3)
        case s @ ("ier" | "Ier" | "ière" | "Ière") =>
          if (inRegion(rv, s)) rep(s.length, "i")
        case "e" => if (inRegion(rv, "e")) del(1)
        case _ => // "ë"
          if (inRegion(rv, "ë") && b.endsWith("guë")) del(1)
      }
    }

    // ---- step 5: undouble --------------------------------------------
    if (ends("enn") || ends("onn") || ends("ett") || ends("ell") ||
        ends("eill")) del(1)

    // ---- step 6: un-accent ---------------------------------------------
    var j = b.length - 1
    while (j >= 0 && !isVowel(b.charAt(j))) j -= 1
    if (j >= 0 && j < b.length - 1 &&
        (b.charAt(j) == 'é' || b.charAt(j) == 'è'))
      b = b.substring(0, j) + 'e' + b.substring(j + 1)

    // ---- postlude: unmark ----------------------------------------------
    val out = b.toCharArray
    var k = 0
    while (k < out.length) {
      val c = out(k)
      if (c == 'I') out(k) = 'i'
      else if (c == 'U') out(k) = 'u'
      else if (c == 'Y') out(k) = 'y'
      k += 1
    }
    new String(out)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{FrenchAnalysis, FrenchStemmer}

/** Pins the Snowball FRENCH stemmer (the published algorithm —
  * FrenchStemmer's contract) with golden vectors per rule family,
  * and the analyzer chain around it (elision, stop filter with
  * consumed positions). The vectors are the engine's CONTRACT: the
  * DuckDB oracles replay the fixed testdata vocabulary's stem
  * classes literally, and this spec fails before the driver gate
  * does if either side drifts. */
class FrenchStemmerSpec extends AnyFunSuite {

  private def s(w: String): String = FrenchStemmer.stem(w)

  test("standard suffixes (step 1): ance/ique/isme families, " +
    "ateur/ation with the ic fallback, logie, usion, ence -> ent, " +
    "ement, ité with abil/ic/iv, if/ive, eaux/aux, euse, issement, " +
    "amment/emment/ment") {
    // verb/noun families collapse to one stem
    for (w <- Seq("continu", "continue", "continuer", "continuation",
        "continuait")) assert(s(w) == "continu", s"$w -> ${s(w)}")
    assert(s("majestueux") == "majestu")
    assert(s("majestueuse") == "majestu")
    assert(s("majestueusement") == "majestu")
    assert(s("grandement") == "grand")
    assert(s("rapidement") == "rapid" && s("rapide") == "rapid")
    assert(s("analogie") == "analog" && s("analogies") == "analog")
    assert(s("conclusion") == "conclus" && s("confusion") == "confus")
    // connexion keeps ion (not preceded by s/t)
    assert(s("connexion") == "connexion")
    assert(s("référence") == "référent" &&
      s("différence") == "différent")
    assert(s("activité") == "activ" && s("activités") == "activ")
    assert(s("capacité") == "capac")
    assert(s("possibilité") == "possibil")
    assert(s("actif") == "actif" && s("active") == "activ")
    assert(s("relatif") == "relat" && s("relative") == "relat")
    assert(s("heureuse") == "heureux" && s("heureux") == "heureux")
    assert(s("beaux") == "beau" && s("beau") == "beau")
    // the famous Snowball aux -> al (journaux keeps the l family;
    // travaux regularizes to traval — the PUBLISHED algorithm's
    // output, a known difference from ES's default light_french)
    assert(s("journaux") == "journal" && s("journal") == "journal")
    assert(s("chevaux") == "cheval" && s("cheval") == "cheval")
    assert(s("travaux") == "traval")
  }

  test("verb suffixes (steps 2a/2b): iss forms, ir forms, er forms, " +
    "a/ait/ant forms; undoubling and un-accenting (steps 5/6)") {
    for (w <- Seq("finissant", "finissait", "finissions", "finir",
        "finit")) assert(s(w) == "fin", s"$w -> ${s(w)}")
    // donn- family undoubles to don
    for (w <- Seq("donnait", "donnant", "donnassent", "donner",
        "donnera")) assert(s(w) == "don", s"$w -> ${s(w)}")
    for (w <- Seq("mangé", "mangée", "mangèrent", "manger"))
      assert(s(w) == "mang", s"$w -> ${s(w)}")
    assert(s("parlaient") == "parl")
    // undouble: enn/onn/ett/ell/eill drop the last letter
    assert(s("belle") == "bel" && s("bonne") == "bon")
    assert(s("cadette") == "cadet" && s("pareille") == "pareil")
    // the ment-family FAIL semantics (the Snowball program, not the
    // prose): a ment/amment/emment alteration alone never selects
    // step 3 — the verb steps must land, else the RESIDUAL step runs
    assert(s("gentiment") == "gent")       // ment, then 2a's i
    assert(s("abondamment") == "abond")    // amment -> ant, 2b's ant
    assert(s("évidemment") == "évident")   // emment -> ent, rest fail
    assert(s("ambiguëment") == "ambigu")   // ment, then residual guë
  }

  test("analyzer chain: elision strips leading articles, the stop " +
    "filter consumes positions, stems ride original indices") {
    assert(FrenchAnalysis.elide("l'avion") == "avion")
    assert(FrenchAnalysis.elide("jusqu'ici") == "ici")
    assert(FrenchAnalysis.elide("aujourd'hui") == "aujourd'hui")
    // "qu'il" elides to the stopword "il" -> vanishes entirely
    assert(FrenchAnalysis.analyze("qu'il") == Seq.empty)
    // stop positions consumed: "la fenêtre de la table" ->
    // fenêtre@1 (la@0 consumed), table stem @4
    assert(FrenchAnalysis.analyzeWithPositions(
      "la continuation de la table") ==
      Seq(("continu", 1), ("tabl", 4)))
    // an all-stopword text analyzes to zero terms
    assert(FrenchAnalysis.analyze("le la les de du") == Seq.empty)
  }

  test("the fixed testdata vocabulary's FRENCH stem classes equal " +
    "the oracle's literal map (the q7_esdsl_*_french contract)") {
    val mapped = Map("customer" -> "custom", "data" -> "dat",
      "filter" -> "filt", "line" -> "lin", "merge" -> "merg",
      "table" -> "tabl", "value" -> "valu")
    val vocabulary = Seq("a", "agg", "batch", "big", "column",
      "customer", "data", "dup", "fast", "filter", "group", "hash",
      "join", "key", "line", "merge", "order", "part", "query", "row",
      "scan", "slow", "small", "sort", "spark", "stream", "table",
      "the", "value", "vector", "window")
    vocabulary.foreach { w =>
      assert(FrenchAnalysis.analyze(w) == Seq(mapped.getOrElse(w, w)),
        s"french stem drift on '$w': ${FrenchAnalysis.analyze(w)}")
    }
    // the french and english chains genuinely differ on this corpus
    assert(graft.functions.EnglishAnalysis.analyze("filter") ==
      Seq("filter"))
    assert(FrenchAnalysis.analyze("filter") == Seq("filt"))
    assert(graft.functions.EnglishAnalysis.analyze("data") ==
      Seq("data"))
    assert(FrenchAnalysis.analyze("data") == Seq("dat"))
  }
}

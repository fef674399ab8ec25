package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{FrenchAnalysis, FrenchLightStemmer,
  FrenchStemmer}

/** Pins BOTH french stemmers with golden vectors:
  * [[FrenchLightStemmer]] (Savoy's light stemmer — what ES 8.11's
  * prebuilt `french` analyzer stems with, and since round 17 what
  * [[FrenchAnalysis]] routes to) and [[FrenchStemmer]] (the
  * published Snowball algorithm — ES's `stemmer: "french"`
  * token-filter form, kept as exactly that). The light vectors are
  * the engine's CONTRACT: the DuckDB oracles replay the fixed
  * testdata vocabulary's stem classes literally, and this spec
  * fails before the driver gate does if either side drifts. */
class FrenchStemmerSpec extends AnyFunSuite {

  private def l(w: String): String = FrenchLightStemmer.stem(w)
  private def s(w: String): String = FrenchStemmer.stem(w)

  // ---------------- light_french: the prebuilt analyzer's stemmer --

  test("light_french plural and x strips: aux regularizes to al " +
    "(eaux keeps eau), plural s/x drop, short words pass through") {
    assert(l("chevaux") == "cheval" && l("cheval") == "cheval")
    assert(l("journaux") == "journal" && l("journal") == "journal")
    assert(l("eaux") == "eau" && l("choux") == "chou")
    assert(l("chansons") == "chanson")
    // the length guards: 4-letter words are untouched
    assert(l("data") == "data" && l("line") == "line")
    assert(l("eau") == "eau" && l("la") == "la" && l("") == "")
  }

  test("light_french noun/verb families: issement/issant → ir, " +
    "ement, ateur/atrice/ation collapse, teur/teuse, ième, isation") {
    assert(l("établissement") == "etabli" && l("établir") == "etabli")
    assert(l("finissant") == "fini")
    assert(l("grandement") == "grand" && l("grande") == "grand")
    assert(l("activement") == "actif")
    // the agent family lands on one stem; the action noun goes one
    // letter shorter (norm strips its trailing r) — light stemming
    // trades perfect merges for simplicity, faithfully
    assert(l("administrateur") == "administr")
    assert(l("administratrice") == "administr")
    assert(l("administration") == "administ")
    assert(l("certificateur") == "certifi")
    assert(l("certificatrice") == "certifi")
    assert(l("éducateur") == "eduqu" && l("éduquer") == "eduqu")
    assert(l("chanteur") == "chant" && l("chanteuse") == "chant")
    assert(l("actrice") == "acteu" && l("acteur") == "acteu")
    assert(l("deuxième") == "deux")
    assert(l("normalisation") == "normal")
    assert(l("actualisation") == "actuel")
    assert(l("composition") == "compos")
  }

  test("light_french adjective families and the norm tail: euse, " +
    "ère, ive, folle/molle, nnelle, ète, ique, esse, inage; accent " +
    "folding, de-doubling, trailing ie/r/e strips") {
    assert(l("heureuse") == "heureu" && l("heureux") == "heureu")
    assert(l("cuisinière") == "cuisini" && l("cuisinier") == "cuisini")
    assert(l("expansive") == "expansif" && l("expansif") == "expansif")
    assert(l("folle") == "fou" && l("molle") == "mou")
    assert(l("professionnelle") == "profesion")
    assert(l("professionnel") == "profesion")
    assert(l("complète") == "complet" && l("complet") == "complet")
    assert(l("électronique") == "electron")
    assert(l("politesse") == "polit")
    assert(l("patinage") == "patin")
    // norm alone: de-doubling + r/e strips + ie strip
    assert(l("donner") == "don" && l("belle") == "bele")
    assert(l("analogie") == "analog" && l("analogies") == "analog")
    assert(l("continuer") == "continu" && l("continue") == "continu")
    assert(l("continuation") == "continu")
    assert(l("continuations") == "continu")
    // light means LIGHT: verb inflections like -ait stay whole
    assert(l("continuait") == "continuait")
  }

  // ---------------- Snowball: the stemmer("french") filter form ----

  test("snowball standard suffixes (step 1): ance/ique/isme " +
    "families, ateur/ation with the ic fallback, logie, usion, " +
    "ence -> ent, ement, ité with abil/ic/iv, if/ive, eaux/aux, " +
    "euse, issement, amment/emment/ment") {
    for (w <- Seq("continu", "continue", "continuer", "continuation",
        "continuait")) assert(s(w) == "continu", s"$w -> ${s(w)}")
    assert(s("majestueux") == "majestu")
    assert(s("majestueuse") == "majestu")
    assert(s("majestueusement") == "majestu")
    assert(s("grandement") == "grand")
    assert(s("rapidement") == "rapid" && s("rapide") == "rapid")
    assert(s("analogie") == "analog" && s("analogies") == "analog")
    assert(s("conclusion") == "conclus" && s("confusion") == "confus")
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
    assert(s("journaux") == "journal" && s("journal") == "journal")
    assert(s("chevaux") == "cheval" && s("cheval") == "cheval")
    assert(s("travaux") == "traval")
  }

  test("snowball verb suffixes (steps 2a/2b): iss forms, ir forms, " +
    "er forms, a/ait/ant forms; undoubling and un-accenting " +
    "(steps 5/6); the ment-family FAIL semantics") {
    for (w <- Seq("finissant", "finissait", "finissions", "finir",
        "finit")) assert(s(w) == "fin", s"$w -> ${s(w)}")
    for (w <- Seq("donnait", "donnant", "donnassent", "donner",
        "donnera")) assert(s(w) == "don", s"$w -> ${s(w)}")
    for (w <- Seq("mangé", "mangée", "mangèrent", "manger"))
      assert(s(w) == "mang", s"$w -> ${s(w)}")
    assert(s("parlaient") == "parl")
    assert(s("belle") == "bel" && s("bonne") == "bon")
    assert(s("cadette") == "cadet" && s("pareille") == "pareil")
    assert(s("gentiment") == "gent")
    assert(s("abondamment") == "abond")
    assert(s("évidemment") == "évident")
    assert(s("ambiguëment") == "ambigu")
  }

  // ---------------- the analyzer chain around the light stemmer ----

  test("analyzer chain: elision strips leading articles, the stop " +
    "filter consumes positions, light stems ride original indices") {
    assert(FrenchAnalysis.elide("l'avion") == "avion")
    assert(FrenchAnalysis.elide("jusqu'ici") == "ici")
    assert(FrenchAnalysis.elide("aujourd'hui") == "aujourd'hui")
    // "qu'il" elides to the stopword "il" -> vanishes entirely
    assert(FrenchAnalysis.analyze("qu'il") == Seq.empty)
    // stop positions consumed: continuation stem @1 (la@0 consumed),
    // table stem @4
    assert(FrenchAnalysis.analyzeWithPositions(
      "la continuation de la table") ==
      Seq(("continu", 1), ("tabl", 4)))
    // an all-stopword text analyzes to zero terms
    assert(FrenchAnalysis.analyze("le la les de du") == Seq.empty)
  }

  test("the fixed testdata vocabulary's LIGHT french stem classes " +
    "equal the oracle's literal map (the q7_esdsl_*_french contract)") {
    val mapped = Map("customer" -> "custom", "filter" -> "filt",
      "merge" -> "merg", "order" -> "ord", "small" -> "smal",
      "table" -> "tabl", "value" -> "valu", "vector" -> "vecto")
    val vocabulary = Seq("a", "agg", "batch", "big", "column",
      "customer", "data", "dup", "fast", "filter", "group", "hash",
      "join", "key", "line", "merge", "order", "part", "query", "row",
      "scan", "slow", "small", "sort", "spark", "stream", "table",
      "the", "value", "vector", "window")
    vocabulary.foreach { w =>
      assert(FrenchAnalysis.analyze(w) == Seq(mapped.getOrElse(w, w)),
        s"french stem drift on '$w': ${FrenchAnalysis.analyze(w)}")
    }
    // the light and Snowball algorithms genuinely differ on this
    // corpus — the round-17 parity swap is observable
    assert(FrenchStemmer.stem("data") == "dat" && l("data") == "data")
    assert(FrenchStemmer.stem("line") == "lin" && l("line") == "line")
    assert(FrenchStemmer.stem("order") == "order" && l("order") == "ord")
    assert(FrenchStemmer.stem("small") == "small" && l("small") == "smal")
    assert(FrenchStemmer.stem("vector") == "vector" &&
      l("vector") == "vecto")
    // the french and english chains genuinely differ on this corpus
    assert(graft.functions.EnglishAnalysis.analyze("filter") ==
      Seq("filter"))
    assert(FrenchAnalysis.analyze("filter") == Seq("filt"))
    // the query stems the idx_french oracles replay
    assert(FrenchAnalysis.analyze("le filter des data") ==
      Seq("filt", "data"))
    assert(FrenchAnalysis.analyze("les groupes et les parts") ==
      Seq("group", "part"))
    assert(FrenchAnalysis.analyze("les groupes de la sorte") ==
      Seq("group", "sort"))
  }
}

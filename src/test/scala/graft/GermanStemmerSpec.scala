package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GermanAnalysis, GermanLightStemmer}

/** Pins the GERMAN chain with golden vectors: ES 8.11's prebuilt
  * `german` analyzer is `lowercase → german_stop →
  * german_normalization → light_german`, and [[GermanAnalysis]]
  * implements exactly that (Savoy's light german stemmer — the
  * published algorithm — plus the ß/umlaut/digraph normalization
  * filter). The vocabulary vectors are the engine's CONTRACT: the
  * DuckDB oracles replay the fixed testdata vocabulary's stem
  * classes literally, and this spec fails before the driver gate
  * does if either side drifts. */
class GermanStemmerSpec extends AnyFunSuite {

  private def st(w: String): String = GermanLightStemmer.stem(w)
  private def full(w: String): String =
    GermanLightStemmer.stem(GermanAnalysis.normalize(w))

  test("light_german step 1 (plural/case endings): -ern, " +
    "-em/-en/-er/-es, -e, -s after an st-ending consonant") {
    assert(st("kindern") == "kind" && st("kinder") == "kind")
    assert(st("kindes") == "kind" && st("kind") == "kind")
    assert(st("tabellen") == "tabell")
    assert(st("gaben") == "gab")
    assert(st("quelle") == "quell")
    // -s only after b d f g h k l m n t: joins strips, windows not
    assert(st("joins") == "join")
    assert(st("windows") == "windows")
    // short words pass through the length guards
    assert(st("rote") == "rot" && st("rot") == "rot")
    assert(st("es") == "es" && st("") == "")
  }

  test("light_german step 2 (inflection endings): -est, -er/-en " +
    "again, -st after an st-ending; both steps compose") {
    // step1 -en then step2 -st: schönsten → schonst → schon
    assert(full("schönsten") == "schon")
    assert(full("schönste") == "schon")
    // step1 strips -er, step2 has nothing left to do
    assert(full("häuser") == "haus" && st("haus") == "haus")
    assert(st("wetter") == "wett")
  }

  test("german_normalization: ß→ss, umlauts fold, ae/oe/ue drop " +
    "the e — except after a vowel or q; stopwords match BEFORE " +
    "normalization (daß stops, dass does not)") {
    assert(GermanAnalysis.normalize("straße") == "strasse")
    assert(full("straße") == "strass")
    assert(full("größe") == "gross")
    assert(full("bäume") == "baum" && st("baum") == "baum")
    // mueller and müller normalize to the same muller → mull
    assert(GermanAnalysis.normalize("mueller") == "muller")
    assert(GermanAnalysis.normalize("müller") == "muller")
    assert(full("mueller") == "mull" && full("müller") == "mull")
    // ue after q or a vowel is NOT a digraph
    assert(GermanAnalysis.normalize("quelle") == "quelle")
    assert(full("quelle") == "quell")
    assert(GermanAnalysis.normalize("aue") == "aue")
    // stop list is matched on the un-normalized lowercase token
    assert(GermanAnalysis.analyze("daß") == Seq.empty)
    assert(GermanAnalysis.analyze("dass") == Seq("dass"))
  }

  test("analyzer chain: the stop filter consumes positions, stems " +
    "ride original indices; an all-stopword text analyzes empty") {
    assert(GermanAnalysis.analyzeWithPositions(
      "die sorten und die batches") ==
      Seq(("sort", 1), ("batch", 4)))
    assert(GermanAnalysis.analyzeWithPositions(
      "die groupen an der sorten") ==
      Seq(("group", 1), ("sort", 4)))
    assert(GermanAnalysis.analyzeWithPositions(
      "die filtern von der data") ==
      Seq(("filt", 1), ("data", 4)))
    assert(GermanAnalysis.analyze("der die das und in von") ==
      Seq.empty)
  }

  test("the fixed testdata vocabulary's GERMAN stem classes equal " +
    "the oracle's literal map (the q7_*_german contract) — and " +
    "genuinely differ from the french map") {
    val mapped = Map("customer" -> "custom", "filter" -> "filt",
      "line" -> "lin", "merge" -> "merg", "order" -> "ord",
      "table" -> "tabl", "value" -> "valu")
    val vocabulary = Seq("a", "agg", "batch", "big", "column",
      "customer", "data", "dup", "fast", "filter", "group", "hash",
      "join", "key", "line", "merge", "order", "part", "query", "row",
      "scan", "slow", "small", "sort", "spark", "stream", "table",
      "the", "value", "vector", "window")
    vocabulary.foreach { w =>
      assert(GermanAnalysis.analyze(w) == Seq(mapped.getOrElse(w, w)),
        s"german stem drift on '$w': ${GermanAnalysis.analyze(w)}")
    }
    // value goes through the ue-digraph (valu), not a stemmer rule
    assert(GermanAnalysis.normalize("value") == "valu")
    // the three language chains split this corpus differently:
    // line stems here and under snowball-french but not light_french;
    // small/vector stem only under light_french
    assert(GermanAnalysis.analyze("line") == Seq("lin"))
    assert(graft.functions.FrenchAnalysis.analyze("line") ==
      Seq("line"))
    assert(GermanAnalysis.analyze("small") == Seq("small"))
    assert(graft.functions.FrenchAnalysis.analyze("small") ==
      Seq("smal"))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{SpanishAnalysis, SpanishLightStemmer}

/** Pins the SPANISH chain with golden vectors: ES 8.11's prebuilt
  * `spanish` analyzer is `lowercase → spanish_stop →
  * spanish_stemmer` with `light_spanish` as the default stemmer,
  * and [[SpanishAnalysis]] implements exactly that (Savoy's light
  * spanish stemmer — the published algorithm; it folds accented
  * vowels itself, there is no separate normalization filter). The
  * vocabulary vectors are the engine's CONTRACT: the DuckDB oracles
  * replay the fixed testdata vocabulary's stem classes literally,
  * and this spec fails before the driver gate does if either side
  * drifts. */
class SpanishStemmerSpec extends AnyFunSuite {

  private def st(w: String): String = SpanishLightStemmer.stem(w)

  test("light_spanish suffix rules: final -o/-a/-e drop; -os/-as/" +
    "-es drop both; -eses keeps one es; -ces becomes -z; other " +
    "finals and short words pass through") {
    assert(st("casas") == "cas" && st("mesas") == "mes")
    assert(st("libros") == "libr" && st("libro") == "libr")
    assert(st("grandes") == "grand" && st("grande") == "grand")
    // the two refinements
    assert(st("franceses") == "frances")
    assert(st("veces") == "vez" && st("cruces") == "cruz")
    // a consonant-final word is left whole
    assert(st("mujer") == "mujer" && st("ciudad") == "ciudad")
    assert(st("quieres") == "quier")
    // < 5 chars: untouched (the length guard) — accents kept too
    assert(st("años") == "años" && st("casa") == "casa")
    assert(st("mesa") == "mesa" && st("") == "")
  }

  test("accent folding happens inside the stemmer (len >= 5 only) " +
    "and survives even when no suffix rule fires") {
    assert(st("técnico") == "tecnic")
    assert(st("sórte") == "sort")
    assert(st("común") == "comun") // no rule fires; folds anyway
    assert(st("águila") == "aguil")
    // 4-letter accented words keep their accents (pass-through)
    assert(st("aquí") == "aquí")
  }

  test("analyzer chain: the stop filter consumes positions, stems " +
    "ride original indices; an all-stopword text analyzes empty; " +
    "the single-letter stopwords a/y/e/o stop") {
    assert(SpanishAnalysis.analyzeWithPositions(
      "la sorte y los partes") ==
      Seq(("sort", 1), ("part", 4)))
    assert(SpanishAnalysis.analyzeWithPositions(
      "las tables de los values") ==
      Seq(("tabl", 1), ("valu", 4)))
    assert(SpanishAnalysis.analyze("de la que el en y a los") ==
      Seq.empty)
    assert(SpanishAnalysis.analyze("el merges y la sorte") ==
      Seq("merg", "sort"))
  }

  test("the fixed testdata vocabulary's SPANISH stem classes equal " +
    "the oracle's literal map (the q7_*_spanish contract) — and " +
    "genuinely differ from the french and german maps") {
    // only three vocabulary words end in a strippable vowel tail;
    // 'a' is a spanish STOPWORD (the preposition), so it leaves the
    // stream entirely — the one vocabulary word any language chain
    // stops
    val mapped = Map("merge" -> "merg", "table" -> "tabl",
      "value" -> "valu")
    val vocabulary = Seq("a", "agg", "batch", "big", "column",
      "customer", "data", "dup", "fast", "filter", "group", "hash",
      "join", "key", "line", "merge", "order", "part", "query", "row",
      "scan", "slow", "small", "sort", "spark", "stream", "table",
      "the", "value", "vector", "window")
    vocabulary.foreach { w =>
      val want = if (w == "a") Seq.empty
        else Seq(mapped.getOrElse(w, w))
      assert(SpanishAnalysis.analyze(w) == want,
        s"spanish stem drift on '$w': ${SpanishAnalysis.analyze(w)}")
    }
    // the four language chains genuinely differ on this corpus:
    // customer/filter/order stem under french+german but NOT
    // spanish (consonant-final), and only spanish stops 'a'
    assert(SpanishAnalysis.analyze("customer") == Seq("customer"))
    assert(graft.functions.FrenchAnalysis.analyze("customer") ==
      Seq("custom"))
    assert(graft.functions.GermanAnalysis.analyze("customer") ==
      Seq("custom"))
    assert(SpanishAnalysis.analyze("filter") == Seq("filter"))
    assert(graft.functions.GermanAnalysis.analyze("a") == Seq("a"))
  }
}

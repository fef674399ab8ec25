package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.serving.QueryString
import graft.serving.QueryString._

/** The strict Lucene classic query_string parser: atoms, field
  * scoping, the classic (non-precedence) AND/OR occur resolution,
  * ranges, and the strictness contract — every syntax defect throws
  * [[QueryString.ParseError]], never a silent re-interpretation. */
class QueryStringSpec extends AnyFunSuite {

  test("atoms: term, phrase with slop, prefix, wildcard, fuzzy, boost") {
    assert(parse("Window") == Term(None, "window"))
    assert(parse("\"The Window\"~2") ==
      Phrase(None, Seq("the", "window"), 2))
    assert(parse("win*") == Prefix(None, "win"))
    assert(parse("w?ndow") == Wild(None, "w?ndow"))
    assert(parse("wi*ow") == Wild(None, "wi*ow"))
    assert(parse("window~1") == Fuzzy(None, "window", 1))
    assert(parse("window~") == Fuzzy(None, "window", 2))
    assert(parse("window^2.5") == Boost(Term(None, "window"), 2.5))
    assert(parse("\"a b\"^3") ==
      Boost(Phrase(None, Seq("a", "b"), 0), 3.0))
  }

  test("field scoping: atom, phrase, group, exists, range") {
    assert(parse("text:window") == Term(Some("text"), "window"))
    assert(parse("text:\"a b\"") ==
      Phrase(Some("text"), Seq("a", "b"), 0))
    assert(parse("lang:(en OR fr)") ==
      Bool(Nil, Seq(Term(Some("lang"), "en"), Term(Some("lang"), "fr")),
        Nil))
    assert(parse("text:*") == Exists("text"))
    assert(parse("_exists_:text") == Exists("text"))
    assert(parse("n:[1 TO 10]") ==
      Range("n", Some("1"), Some("10"), incLo = true, incHi = true))
    assert(parse("n:{1 TO *]") ==
      Range("n", Some("1"), None, incLo = false, incHi = true))
  }

  test("classic occur resolution: 'a AND b OR c' means '+a +b c'") {
    // Lucene's QueryParser is NOT a precedence grammar — AND
    // retroactively promotes its defaulted left neighbor to MUST
    assert(parse("a AND b OR c") == Bool(
      Seq(Term(None, "a"), Term(None, "b")), Seq(Term(None, "c")), Nil))
    // and OR demotes a defaulted MUST under default_operator=and
    assert(QueryString.parse("a OR b c", defaultAnd = true) == Bool(
      Seq(Term(None, "c")),
      Seq(Term(None, "a"), Term(None, "b")), Nil))
    // explicit +/- pins a clause against retroaction
    assert(parse("+a OR b") ==
      Bool(Seq(Term(None, "a")), Seq(Term(None, "b")), Nil))
  }

  test("modifiers: +, -, !, NOT; mid-term '-' stays in the term") {
    assert(parse("+a -b") ==
      Bool(Seq(Term(None, "a")), Nil, Seq(Term(None, "b"))))
    assert(parse("a NOT b") ==
      Bool(Nil, Seq(Term(None, "a")), Seq(Term(None, "b"))))
    assert(parse("a !b") ==
      Bool(Nil, Seq(Term(None, "a")), Seq(Term(None, "b"))))
    assert(parse("foo-bar") == Term(None, "foo-bar"))
  }

  test("&&/|| synonyms and grouping") {
    assert(parse("a && b") == parse("a AND b"))
    assert(parse("a || b") == parse("a OR b"))
    assert(parse("(a OR b) AND c") == Bool(
      Seq(Bool(Nil, Seq(Term(None, "a"), Term(None, "b")), Nil),
        Term(None, "c")), Nil, Nil))
  }

  test("escapes neutralize specials") {
    assert(parse("\\+a") == Term(None, "+a"))
    assert(parse("te\\*t") == Term(None, "te*t"))
    assert(parse("f\\:x") == Term(None, "f:x"))
  }

  test("fuzz: arbitrary input either parses or throws ParseError — " +
    "never a crash, never unbounded work") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val special = Gen.oneOf(
      "(", ")", "[", "]", "{", "}", "\"", "~", "^", ":", "\\", "*",
      "?", "+", "-", "!", "&&", "||", "AND", "OR", "NOT", "TO", " ")
    val word = Gen.alphaNumStr.map(_.take(6))
    val piece = Gen.frequency(3 -> special, 2 -> word)
    val query = Gen.listOfN(12, piece).map(_.mkString)
    var seed = Seed(42L)
    (1 to 500).foreach { _ =>
      val (q, s2) = {
        val r = query.pureApply(Gen.Parameters.default, seed)
        (r, seed.next)
      }
      seed = s2
      try { parse(q); () }
      catch {
        case _: ParseError => ()
        // anything else is a parser bug on input `q`
        case e: Throwable  => fail(s"non-ParseError on <$q>: $e")
      }
    }
  }

  test("strictness: syntax defects throw, never re-interpret") {
    def bad(s: String): Unit = { intercept[ParseError](parse(s)); () }
    bad("")                 // empty query
    bad("(a")               // unclosed group
    bad("\"a b")            // unclosed quote
    bad("a AND")            // dangling operator
    bad("AND a")            // misplaced operator
    bad("a AND OR b")       // doubled operator
    bad("n:[1 TO")          // unclosed range
    bad("n:[TO 2]")         // missing bound keyword collision
    bad("n:[* TO *]")       // both bounds open
    bad("a^")               // boost without number
    bad("a~5")              // fuzzy beyond Lucene's 0..2
    bad("te?t~1")           // fuzzy + wildcard
    bad("*")                // bare * without field
    bad("f:(g:x)")          // nested field scope
  }
}

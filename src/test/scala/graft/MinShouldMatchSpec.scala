package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.serving.MinShouldMatch.resolve

/** ES `minimum_should_match` grammar, pinned to the documented examples
  * (integer / negative / percentage / negative percentage / conditional
  * combinations). */
class MinShouldMatchSpec extends AnyFunSuite {

  test("integer and negative integer forms") {
    assert(resolve("3", 5).contains(3))
    assert(resolve("-2", 5).contains(3))
    assert(resolve("0", 5).contains(0))
    assert(resolve("-7", 5).contains(-2)) // callers clamp to ≥1
  }

  test("percentage forms round DOWN; negative percentage is the " +
    "missing share") {
    assert(resolve("75%", 4).contains(3))
    assert(resolve("75%", 5).contains(3))  // 3.75 → 3
    assert(resolve("-25%", 4).contains(3))
    assert(resolve("-25%", 5).contains(4)) // missing 1.25 → 1; 5-1=4
    assert(resolve("100%", 7).contains(7))
    assert(resolve("0%", 7).contains(0))
  }

  test("single conditional: at-or-below the bound requires ALL") {
    assert(resolve("3<90%", 3).contains(3))  // ≤3 → all required
    assert(resolve("3<90%", 2).contains(2))
    assert(resolve("3<90%", 10).contains(9)) // >3 → 90% of 10
  }

  test("multiple conditionals pick the largest applicable bound " +
    "(the ES docs' 2<-25% 9<-3 example)") {
    val spec = "2<-25% 9<-3"
    assert(resolve(spec, 1).contains(1))   // ≤2: all required
    assert(resolve(spec, 2).contains(2))
    assert(resolve(spec, 3).contains(3))   // 3-9: all but 25% (floor)
    assert(resolve(spec, 8).contains(6))   // 8 - floor(2) = 6
    assert(resolve(spec, 9).contains(7))   // 9 - floor(2.25) = 7
    assert(resolve(spec, 10).contains(7))  // >9: all but 3
    assert(resolve(spec, 20).contains(17))
  }

  test("malformed specs resolve to None, never a silent zero") {
    for (bad <- Seq("", "abc", "2<", "<3", "2<<3", "x<50%", "50%%",
        "2<-25% 9<-x", "--3"))
      assert(resolve(bad, 5).isEmpty, s"'$bad' should be malformed")
  }
}

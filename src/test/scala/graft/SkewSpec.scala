package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // hot key 1L carries most rows — the shape salting exists for
  private val big = ((1 to 50).map(i => (1L, s"v$i")) ++
    Seq((2L, "x"), (3L, "y"))).toDF("k", "v")
  private val small = Seq((1L, "one"), (2L, "two"), (4L, "four"))
    .toDF("k2", "name")

  test("saltedJoin ≡ plain join (inner)") {
    val plain = big.join(small, big("k") === small("k2"))
      .orderBy("k", "v").collect().map(_.toSeq).toSeq
    val salted = Skew.saltedJoin(big, small, "k", "k2", factor = 4)
      .orderBy("k", "v").collect().map(_.toSeq).toSeq
    assert(salted == plain)
  }

  test("saltedJoin ≡ plain join (left) — unmatched rows survive once") {
    val plain = big.join(small, big("k") === small("k2"), "left")
      .orderBy("k", "v").collect().map(_.toSeq).toSeq
    val salted = Skew.saltedJoin(big, small, "k", "k2", 4, "left")
      .orderBy("k", "v").collect().map(_.toSeq).toSeq
    assert(salted == plain)
  }

  test("salt is deterministic across evaluations") {
    val s1 = big.select(Skew.salt(8, col("k"), col("v")).as("s"))
      .collect().map(_.getInt(0)).toSeq
    val s2 = big.select(Skew.salt(8, col("k"), col("v")).as("s"))
      .collect().map(_.getInt(0)).toSeq
    assert(s1 == s2)
    assert(s1.distinct.size > 1) // actually spreads
  }
}

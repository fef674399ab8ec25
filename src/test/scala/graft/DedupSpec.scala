package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "spark reads parquet fast and filters early then " +
    "joins broadcast dims and aggregates partials before the shuffle"
  private def docs = Seq(
    (1L, base),
    (2L, base),                       // exact dup of 1
    (3L, base + " with one extra"),   // near dup of 1
    (4L, "completely unrelated text about gardens flowers bees honey " +
      "pollen hives queens workers drones nectar")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical content, keeps min id") {
    val out = Dedup.exact(docs, "doc_id", "text")
    assert(out.count() == 3)
    val dup = out.filter(col("dup_count") === 2).collect()(0)
    assert(dup.getAs[Long]("canonical_id") == 1L)
  }

  test("minhash near-dups finds exact+near pairs, not unrelated ones") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text")
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("jaccard pairs: exact dup scores 1.0, near dup below") {
    val out = Dedup.jaccardPairs(docs, "doc_id", "text", minJaccard = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        r.getAs[Double]("jaccard"))).toMap
    assert(out((1L, 2L)) == 1.0)
    assert(out((1L, 3L)) < 1.0 && out((1L, 3L)) > 0.5)
  }

  test("simhash pairs: identical docs at hamming 0") {
    val out = Dedup.simhashPairs(docs, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        r.getAs[Int]("hamming").toLong)).toMap
    assert(out((1L, 2L)) == 0L)
  }

  test("embedding near-dups: parallel vectors found, orthogonal not") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(2.0f, 0.01f, 0.0f)),  // ~parallel to 1
      (3L, Array(0.0f, 1.0f, 0.0f))    // orthogonal
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(emb, "vec_id", "embedding",
      minCosine = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }
}

package graft

import graft.operators.Chunk

class ChunkSpec extends SparkSpec {
  import spark.implicits._

  test("chunks tile the document with the requested stride and overlap") {
    // 10 tokens, size 4, stride 3 → starts 0,3,6 → lengths 4,4,4;
    // a start at 9 would chunk [t9] ⊂ chunk-at-6 (t6..t9) and is not
    // emitted — chunk at 6 already reaches the document end
    val docs = Seq((1L, (0 until 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Chunk.split(docs, "doc_id", "text", window = 4, stride = 3)
      .orderBy("chunk_idx").collect()
    assert(out.map(_.getAs[Int]("chunk_idx")).toSeq == Seq(0, 1, 2))
    assert(out.map(_.getAs[Int]("n_chunk_tokens")).toSeq == Seq(4, 4, 4))
    // chunk 1 (t3..t6) overlaps chunk 0 (t0..t3) by exactly one token —
    // hashes differ, and re-chunking is deterministic
    assert(out.map(_.getAs[String]("chunk_hash")).distinct.length == 3)
    val again = Chunk.split(docs, "doc_id", "text", 4, 3)
      .orderBy("chunk_idx").collect().map(_.getAs[String]("chunk_hash"))
    assert(again.sameElements(out.map(_.getAs[String]("chunk_hash"))))
  }

  test("no trailing chunk that is a subset of the previous one; " +
    "every token still covered") {
    // 100 tokens, window 64, stride 48: naive starts 0,48,96 — the
    // 4-token chunk at 96 is contained in the chunk at 48 (t48..t99).
    // Emitted starts must be 0,48 and still cover tokens 0..99.
    val docs = Seq((1L, (0 until 100).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Chunk.split(docs, "doc_id", "text", window = 64, stride = 48)
      .orderBy("chunk_idx").collect()
    assert(out.map(_.getAs[Int]("chunk_idx")).toSeq == Seq(0, 1))
    // chunk 1 starts at 48 and has 52 tokens → last covered index is 99
    assert(out.map(_.getAs[Int]("n_chunk_tokens")).toSeq == Seq(64, 52))
    // exact-multiple case keeps its trailing full-coverage chunk:
    // 8 tokens, window 4, stride 4 → starts 0,4
    val exact = Seq((2L, (0 until 8).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val eo = Chunk.split(exact, "doc_id", "text", window = 4, stride = 4)
      .orderBy("chunk_idx").collect()
    assert(eo.map(_.getAs[Int]("n_chunk_tokens")).toSeq == Seq(4, 4))
  }

  test("short and empty docs: one chunk or none") {
    val docs = Seq((1L, "a b"), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
    val out = Chunk.split(docs, "doc_id", "text", window = 64, stride = 48)
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("doc_id") == 1L)
    assert(out(0).getAs[Int]("n_chunk_tokens") == 2)
  }

  test("stride > size is rejected (would drop tokens silently)") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunk.split(docs, "doc_id", "text", window = 4, stride = 5)
    }
  }
}

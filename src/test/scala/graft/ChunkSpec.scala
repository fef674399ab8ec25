package graft

import graft.operators.Chunk

class ChunkSpec extends SparkSpec {
  import spark.implicits._

  test("chunks tile the document with the requested stride and overlap") {
    // 10 tokens, size 4, stride 3 → starts 0,3,6,9 → lengths 4,4,4,1
    val docs = Seq((1L, (0 until 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Chunk.split(docs, "doc_id", "text", window = 4, stride = 3)
      .orderBy("chunk_idx").collect()
    assert(out.map(_.getAs[Int]("chunk_idx")).toSeq == Seq(0, 1, 2, 3))
    assert(out.map(_.getAs[Int]("n_chunk_tokens")).toSeq == Seq(4, 4, 4, 1))
    // chunk 1 (t3..t6) overlaps chunk 0 (t0..t3) by exactly one token —
    // hashes differ, and re-chunking is deterministic
    assert(out.map(_.getAs[String]("chunk_hash")).distinct.length == 4)
    val again = Chunk.split(docs, "doc_id", "text", 4, 3)
      .orderBy("chunk_idx").collect().map(_.getAs[String]("chunk_hash"))
    assert(again.sameElements(out.map(_.getAs[String]("chunk_hash"))))
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

package graft

import graft.operators.{MediaRecord, Multimodal}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("feature extraction is deterministic and keeps ids/types") {
    val docs = Seq((1L, "hello world"), (2L, "spark")).toDF("doc_id", "text")
    val out = Multimodal.features(
      Multimodal.fromText(docs, "doc_id", "text"))
      .collect().sortBy(_.media_id)
    assert(out.length == 2)
    assert(out(0).media_type == "text")
    assert(out(0).n_bytes == 11)
    assert(out(0).content_hash ==
      "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
    assert(out(0).feature_str == "11,77,85,117")
  }

  test("resize truncates payloads deterministically, keeps metadata") {
    val docs = Seq((1L, "hello world"), (2L, "hi")).toDF("doc_id", "text")
    val out = Multimodal.resize(
      Multimodal.fromText(docs, "doc_id", "text"), targetBytes = 5)
      .collect().sortBy(_.media_id)
    assert(new String(out(0).blob, "UTF-8") == "hello")
    assert(new String(out(1).blob, "UTF-8") == "hi") // shorter than target
  }

  test("sampleFrames slices into chunks and keeps every nth") {
    val docs = Seq((1L, "abcdefghij")).toDF("doc_id", "text") // 10 bytes
    val frames = Multimodal.sampleFrames(
      Multimodal.fromText(docs, "doc_id", "text"),
      frameBytes = 2, everyNth = 2)
      .collect().sortBy(_.frame_idx)
    // chunks: ab cd ef gh ij (idx 0..4); every 2nd → idx 0, 2, 4
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    assert(frames.map(f => new String(f.frame, "UTF-8")).toSeq ==
      Seq("ab", "ef", "ij"))
  }

  test("decodeBatch sees bounded batches (the codec contract)") {
    val records = (1 to 200).map(i =>
      MediaRecord(i.toLong, "text", Array.fill(i)(7.toByte)))
    val batches = records.grouped(Multimodal.BatchSize).toSeq
    assert(batches.forall(_.size <= Multimodal.BatchSize))
    val feats = batches.flatMap(Multimodal.decodeBatch)
    assert(feats.map(_.media_id) == records.map(_.media_id))
  }
}

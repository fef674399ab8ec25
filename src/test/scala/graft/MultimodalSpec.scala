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

  test("real PPM decode: true dims + channel means from actual pixels") {
    import graft.operators.Ppm
    // 2×2: red, green, blue, white — known means
    val pixels: Array[Byte] = Array(
      255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255).map(_.toByte)
    val blob = Ppm.encode(Ppm.Image(2, 2, pixels))
    val Seq(f) = Multimodal.decodeBatch(
      Seq(MediaRecord(1L, "image/ppm", blob)))
    // every channel sums 255+255 over 4 pixels → mean 127.50
    assert(f.feature_str == "2,2,127.50,127.50,127.50", f.feature_str)
    assert(f.n_bytes == blob.length)
  }

  test("PPM codec round-trips, handles comments, rejects junk") {
    import graft.operators.Ppm
    val img = Ppm.Image(3, 1, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9))
    val back = Ppm.decode(Ppm.encode(img)).get
    assert(back.w == 3 && back.h == 1 &&
      back.pixels.toSeq == img.pixels.toSeq)
    val commented =
      "P6\n# a comment\n3 1\n255\n".getBytes("US-ASCII") ++ img.pixels
    assert(Ppm.decode(commented).exists(_.w == 3))
    assert(Ppm.decode("not an image".getBytes).isEmpty)
    assert(Ppm.decode("P6\n2 2\n255\nxx".getBytes).isEmpty) // truncated
  }

  test("resizeImage really resamples PPM rows; others pass through") {
    import graft.operators.Ppm
    // 4×1 gradient: 0, 60, 120, 180 (gray)
    val px = Array(0, 60, 120, 180).flatMap(v => Seq(v, v, v)).map(_.toByte)
    val blob = Ppm.encode(Ppm.Image(4, 1, px))
    val media = Seq(
      MediaRecord(1L, "image/ppm", blob),
      MediaRecord(2L, "text", "hello".getBytes))
    import spark.implicits._
    val out = Multimodal.resizeImage(media.toDS(), 2, 1)
      .collect().sortBy(_.media_id)
    val resized = Ppm.decode(out(0).blob).get
    assert(resized.w == 2 && resized.h == 1)
    // nearest neighbor picks source x = 0*4/2=0 and 1*4/2=2 → 0, 120
    assert(resized.pixels.toSeq.map(_ & 0xff) == Seq(0, 0, 0, 120, 120, 120))
    assert(new String(out(1).blob) == "hello") // non-image untouched
  }

  test("PPM codec: random images round-trip bit-for-bit; resize dims hold") {
    import graft.operators.Ppm
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val imgGen = for {
      w <- Gen.choose(1, 24)
      h <- Gen.choose(1, 24)
      px <- Gen.listOfN(3 * w * h, Gen.choose(0, 255))
    } yield Ppm.Image(w, h, px.map(_.toByte).toArray)
    val imgs = (0 until 100).flatMap(i =>
      imgGen.apply(Gen.Parameters.default, Seed(7L + i)))
    imgs.foreach { img =>
      val back = Ppm.decode(Ppm.encode(img)).get
      assert(back.w == img.w && back.h == img.h)
      assert(java.util.Arrays.equals(back.pixels, img.pixels))
      val rz = Ppm.resizeNearest(img, 5, 3)
      assert(rz.w == 5 && rz.h == 3 && rz.pixels.length == 45)
      // every output pixel exists somewhere in the source row it samples
      val (r, g, b) = Ppm.meanRgb(rz)
      assert(r >= 0 && r <= 255 && g >= 0 && g <= 255 && b >= 0 && b <= 255)
    }
  }

  test("WAV codec: random clips round-trip bit-for-bit; unknown " +
    "subchunks skipped; junk rejected") {
    import graft.operators.Wav
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val clipGen = for {
      rate <- Gen.oneOf(8000, 16000, 44100)
      ch <- Gen.choose(1, 2)
      frames <- Gen.choose(0, 400)
      xs <- Gen.listOfN(frames * ch,
        Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt))
    } yield Wav.Clip(rate, ch, xs.map(_.toShort).toArray)
    val clips = (0 until 100).flatMap(i =>
      clipGen.apply(Gen.Parameters.default, Seed(11L + i)))
    assert(clips.nonEmpty)
    clips.foreach { c =>
      val back = Wav.decode(Wav.encode(c)).get
      assert(back.sampleRate == c.sampleRate && back.channels == c.channels)
      assert(java.util.Arrays.equals(back.samples, c.samples))
    }
    // an unknown LIST subchunk between fmt and data must be skipped
    val c = Wav.Clip(8000, 1, Array[Short](1, -2, 3))
    val enc = Wav.encode(c)
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val withList = enc.take(36) ++ listChunk ++ enc.drop(36)
    // fix the RIFF size field (4..8) for the inserted 12 bytes
    val riffSz = (enc.length - 8) + 12
    withList(4) = (riffSz & 0xff).toByte
    withList(5) = ((riffSz >> 8) & 0xff).toByte
    val back = Wav.decode(withList)
    assert(back.exists(b => java.util.Arrays.equals(b.samples, c.samples)))
    // junk and truncation are rejected, not mis-decoded
    assert(Wav.decode("not a wav at all".getBytes).isEmpty)
    assert(Wav.decode(enc.take(enc.length - 1)).isEmpty)
    assert(Wav.decode(Array[Byte]()).isEmpty)
    // adversarial chunk size near Int.MaxValue: `body + sz` overflows
    // negative in Int arithmetic and would slip past a naive bounds
    // check into a huge allocation — must be a clean None
    val evil = enc.clone()
    evil(40) = -1; evil(41) = -1; evil(42) = -1; evil(43) = 0x7f.toByte
    assert(Wav.decode(evil).isEmpty)
  }

  test("byte-budget resize is REAL for decodable rows: PPM rescales " +
    "dimensions, WAV rescales rate, both fit the budget and still " +
    "decode; junk rows truncate") {
    import graft.operators.{Multimodal, MediaRecord, Ppm, Wav}
    import spark.implicits._
    val img = Ppm.Image(64, 32, Array.tabulate(3 * 64 * 32)(_.toByte))
    val clip = Wav.Clip(16000, 2,
      Array.tabulate(16000 * 2)(i => (i % 251).toShort))
    val media = Seq(
      MediaRecord(1L, "image/ppm", Ppm.encode(img)),
      MediaRecord(2L, "audio/wav", Wav.encode(clip)),
      MediaRecord(3L, "text", Array.fill(5000)(7.toByte)),
      MediaRecord(4L, "image/ppm", Array.fill(3000)(9.toByte)) // junk
    ).toDS()
    val target = 2000
    val out = Multimodal.resize(media, target).collect()
      .map(m => m.media_id -> m).toMap
    assert(out.values.forall(_.blob.length <= target))
    // the PPM row is a real, smaller image — not a truncated prefix
    val small = Ppm.decode(out(1L).blob).get
    assert(small.w < 64 && small.h < 32 && small.w >= 1 && small.h >= 1)
    assert(small.w * small.h * 3 <= target)
    // aspect ratio roughly preserved by the uniform sqrt scale
    assert(math.abs(small.w.toDouble / small.h - 2.0) < 0.6,
      s"${small.w}x${small.h}")
    // the WAV row is a real lower-rate clip, channels preserved
    val re = Wav.decode(out(2L).blob).get
    assert(re.channels == 2 && re.sampleRate < 16000 && re.nFrames > 0)
    // junk and unknown types fall back to deterministic truncation
    assert(out(3L).blob.length == target)
    assert(out(4L).blob.length == target)
    // already-small rows pass through untouched
    val tiny = Multimodal.resize(media, 1 << 20).collect()
    assert(tiny.forall(m => java.util.Arrays.equals(m.blob,
      media.collect().find(_.media_id == m.media_id).get.blob)))
  }

  test("AVI codec: random videos round-trip bit-exact; junk, " +
    "truncation and overflow sizes rejected") {
    import graft.operators.Avi
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val vidGen = for {
      w <- Gen.choose(1, 64)
      h <- Gen.choose(1, 64)
      us <- Gen.oneOf(16667, 33333, 40000)
      n <- Gen.choose(0, 12)
      frames <- Gen.listOfN(n,
        Gen.choose(0, 200).flatMap(sz =>
          Gen.listOfN(sz, Gen.choose(-128, 127))
            .map(_.map(_.toByte).toArray)))
    } yield Avi.Video(w, h, us, frames.toVector)
    val vids = (0 until 60).flatMap(i =>
      vidGen.apply(Gen.Parameters.default, Seed(7L + i)))
    assert(vids.nonEmpty)
    vids.foreach { v =>
      val back = Avi.decode(Avi.encode(v))
      assert(back.contains(v), s"round-trip failed for $v")
    }
    val enc = Avi.encode(Avi.Video(4, 4, 40000,
      Vector(Array[Byte](1, 2, 3), Array[Byte](4, 5))))
    assert(Avi.decode("RIFFxxxxWAVE".getBytes).isEmpty) // wrong form type
    assert(Avi.decode(enc.take(enc.length - 1)).isEmpty) // truncated
    assert(Avi.decode(Array[Byte]()).isEmpty)
    // adversarial chunk size near Int.MaxValue must not wrap past the
    // bounds check (same guard as WAV)
    val evil = enc.clone()
    val movi = {
      // find the 00db chunk and blow up its declared size
      var i = 12; var at = -1
      while (at < 0 && i + 8 <= evil.length) {
        if (new String(evil, i, 4, "US-ASCII") == "00db") at = i
        else i += 1
      }
      at
    }
    assert(movi > 0)
    evil(movi + 4) = -1; evil(movi + 5) = -1
    evil(movi + 6) = -1; evil(movi + 7) = 0x7f.toByte
    assert(Avi.decode(evil).isEmpty)
  }

  test("real AVI frame sampling: sampleFrames walks the movi chunks, " +
    "not byte slices; features carry true dims and frame counts") {
    import graft.operators.{Avi, Multimodal, MediaRecord}
    import spark.implicits._
    val frames = (0 until 7).map(i =>
      Array.fill(10 + i)(i.toByte)).toVector
    val avi = Avi.encode(Avi.Video(16, 8, 40000, frames))
    val media = Seq(
      MediaRecord(1L, "video/avi", avi),
      MediaRecord(2L, "text", "0123456789".getBytes)).toDS()
    val sampled = Multimodal.sampleFrames(media, frameBytes = 4,
      everyNth = 2).collect()
    val vid = sampled.filter(_.media_id == 1L).sortBy(_.frame_idx)
    // true movi frames 0,2,4,6 — with their real indexes and payloads
    assert(vid.map(_.frame_idx).toSeq == Seq(0, 2, 4, 6))
    assert(vid.forall(f =>
      java.util.Arrays.equals(f.frame, frames(f.frame_idx))))
    // the non-AVI row still gets the stub byte-slice arm
    val txt = sampled.filter(_.media_id == 2L)
    assert(txt.map(_.frame_idx).toSeq.sorted == Seq(0, 2))
    // decodeBatch: real container features (w, h, frames, usPerFrame)
    val feats = Multimodal.decodeBatch(Seq(
      MediaRecord(1L, "video/avi", avi),
      MediaRecord(3L, "video/avi", "not an avi".getBytes)))
    assert(feats.head.feature_str == "16,8,7,40000")
    // junk AVI rows fall back to the deterministic stub, not a crash
    assert(feats(1).feature_str.split(",").length == 4)
    // MJPEG frames (baseline-JPEG payloads) decode for REAL: container
    // metadata + first-frame dims and mean RGB (uniform 77-gray block
    // at quality 90 round-trips to exactly 77: round(round(8·(-51)/3)
    // ·3/8)+128 = 77)
    import graft.operators.{Jpeg, Ppm}
    val jf = Jpeg.encode(Ppm.Image(16, 8,
      Array.fill(3 * 16 * 8)(77.toByte)), quality = 90)
    val mj = Avi.encode(Avi.Video(16, 8, 40000, Vector(jf, jf)))
    val mjFeat = Multimodal.decodeBatch(
      Seq(MediaRecord(4L, "video/avi", mj))).head.feature_str
    assert(mjFeat == "16,8,2,40000,16,8,77.00,77.00,77.00", mjFeat)
    // bare image/jpeg blobs ride the same decode arm as image/ppm
    val jFeat = Multimodal.decodeBatch(
      Seq(MediaRecord(5L, "image/jpeg", jf))).head.feature_str
    assert(jFeat == "16,8,77.00,77.00,77.00", jFeat)
  }

  test("WAV resample: duration preserved, frame count scales with rate, " +
    "channels stay interleaved") {
    import graft.operators.Wav
    val frames = 1000
    val stereo = Wav.Clip(16000, 2,
      Array.tabulate(frames * 2)(i =>
        if (i % 2 == 0) (i / 2).toShort else (-(i / 2)).toShort))
    val down = Wav.resampleNearest(stereo, 8000)
    assert(down.sampleRate == 8000 && down.channels == 2)
    assert(down.nFrames == frames / 2)
    // each output frame is a REAL source frame: left == -right everywhere
    assert(down.samples.grouped(2).forall(p => p(0) == -p(1)))
    val up = Wav.resampleNearest(down, 32000)
    assert(up.nFrames == frames * 2 && up.samples.grouped(2)
      .forall(p => p(0) == -p(1)))
  }

  test("real WAV decode in the batch path: true rate/frames/RMS; " +
    "resampleAudio halves frames, non-audio passes through") {
    import graft.operators.Wav
    import spark.implicits._
    // a 440-sample square wave at full scale has RMS exactly 16384
    val sq = Wav.Clip(8000, 1,
      Array.tabulate[Short](440)(i => if (i % 2 == 0) 16384 else -16384))
    val media = Seq(
      MediaRecord(1L, "audio/wav", Wav.encode(sq)),
      MediaRecord(2L, "audio/wav", "garbage".getBytes), // stub fallback
      MediaRecord(3L, "text", "hello".getBytes)).toDS()
    val feats = Multimodal.features(media).collect()
      .map(f => f.media_id -> f.feature_str).toMap
    assert(feats(1L) == "8000,1,440,16384.00")
    assert(feats(2L) == Seq(7 % 256, 7 * 7 % 256, 7 * 31 % 256,
      7 * 127 % 256).mkString(","))
    val resampled = Multimodal.resampleAudio(media, 4000)
      .collect().sortBy(_.media_id)
    val halved = Wav.decode(resampled(0).blob).get
    assert(halved.sampleRate == 4000 && halved.nFrames == 220)
    assert(new String(resampled(2).blob) == "hello")
  }

  test("decodeBatch sees bounded batches (the codec contract)") {
    val records = (1 to 200).map(i =>
      MediaRecord(i.toLong, "text", Array.fill(i)(7.toByte)))
    val batches = records.grouped(Multimodal.BatchSize).toSeq
    assert(batches.forall(_.size <= Multimodal.BatchSize))
    val feats = batches.flatMap(Multimodal.decodeBatch)
    assert(feats.map(_.media_id) == records.map(_.media_id))
  }

  test("shard manifest: streaming-pack bound holds, packing binds") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("multimodal_shards")(
      spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    val maxItem = Multimodal
      .fromText(spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"), "doc_id", "text")
      .toDF().select(max(length(col("blob")))).collect()(0).getInt(0)
    // a shard can exceed the budget by at most one item (the document
    // that crossed the boundary stays in the shard its prefix ends in)
    assert(rows.forall(_.getAs[Long]("total_bytes") < 4096L + maxItem))
    // and the budget actually binds: some slice has more than one shard
    assert(rows.groupBy(_.getAs[Int]("slice"))
      .exists(_._2.length > 1))
  }
}

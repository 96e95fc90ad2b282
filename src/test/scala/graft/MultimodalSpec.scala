package graft

import graft.ops.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: typed metadata, batched partition-local decode,
  * relational frame/chunk fan-out. Both codecs are real from-scratch
  * parsers ([[graft.ops.WavCodec]] RIFF/WAVE, [[graft.ops.PnmCodec]]
  * PPM/PGM); [[graft.ops.Multimodal.OpaqueStats]] covers unknown codecs. */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-multimodal-spec")
    .getOrCreate()

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private def assets = Multimodal.syntheticAssets(docs)

  test("synthetic assets carry typed metadata and cycle kinds deterministically") {
    val a = assets.orderBy("asset_id").limit(6).collect()
    assert(a.map(_.getAs[String]("kind")).toSeq ==
      Seq("image", "audio", "video", "image", "audio", "video"))
    val m = a.head.getStruct(a.head.fieldIndex("meta"))
    assert(m.getAs[Int]("channels") == 3)
    assert(m.getAs[Long]("duration_ms") % 1000 == 0)
  }

  test("WAV codec: write/parse round-trip, chunk tolerance, corruption rejected") {
    import graft.ops.WavCodec
    val samples = Array.tabulate[Short](320)(i => ((i * 7) % 2048 - 1024).toShort)
    val wav = WavCodec.write(16000, 1, samples)
    assert(wav.length == 44 + 640)
    val info = WavCodec.parse(wav)
    assert(info.sampleRate == 16000 && info.channels == 1 && info.bitsPerSample == 16)
    assert(info.nFrames == 320 && info.durationMs == 20)
    assert(info.sumSamples == samples.map(_.toLong).sum)

    // stereo frames count once per block, not per sample
    val stereo = WavCodec.parse(WavCodec.write(8000, 2, samples))
    assert(stereo.nFrames == 160 && stereo.durationMs == 20)

    // an extra LIST chunk (odd size → padded) between fmt and data is walked
    // over per the RIFF spec, not mistaken for audio
    val extra = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 'i', 'n', 'f', 'o', 'x', 0)
    val spliced = wav.take(36) ++ extra ++ wav.drop(36)
    // RIFF size field must cover the insert
    val riffSize = 36 + extra.length + 640
    spliced(4) = riffSize.toByte; spliced(5) = (riffSize >> 8).toByte
    val tolerant = WavCodec.parse(spliced)
    assert(tolerant.nFrames == 320 && tolerant.sumSamples == info.sumSamples)

    // corruption fails loudly: bad magic, truncation, non-PCM format tag
    intercept[IllegalArgumentException] { WavCodec.parse("not a wav at all".getBytes) }
    intercept[IllegalArgumentException] { WavCodec.parse(wav.take(50)) }
    val nonPcm = wav.clone(); nonPcm(20) = 3 // IEEE float tag
    intercept[IllegalArgumentException] { WavCodec.parse(nonPcm) }
  }

  test("audioInfo parses real WAV fixtures distributively and exactly") {
    val info = Multimodal.audioInfo(Multimodal.syntheticWavAssets(docs))
      .orderBy("asset_id").limit(10).collect()
    info.foreach { r =>
      val a = r.getAs[Long]("asset_id")
      val n = ((a % 30) + 1) * 160
      assert(r.getAs[Int]("sample_rate") == 16000)
      assert(r.getAs[Int]("channels") == 1)
      assert(r.getAs[Long]("n_frames") == n)
      assert(r.getAs[Long]("duration_ms") == ((a % 30) + 1) * 10)
      val expectedSum = (0L until n).map(i => (a * 31 + i * 7) % 2048 - 1024).sum
      assert(r.getAs[Long]("sum_samples") == expectedSum, s"asset $a")
    }
  }

  test("batched opaque-binary stats match a direct per-row computation") {
    val stats = Multimodal.decodeStats(assets, batchSize = 7)
      .orderBy("asset_id").limit(20).collect()
    val direct = assets.orderBy("asset_id").limit(20).collect()
    stats.zip(direct).foreach { case (s, d) =>
      val content = d.getAs[Array[Byte]]("content")
      val sum = content.map(_ & 0xff).map(_.toLong).sum
      assert(s.getAs[Long]("n_bytes") == content.length.toLong)
      assert(s.getAs[Long]("sum_bytes") == sum)
      assert(s.getAs[Long]("mean_byte_x1000") ==
        (if (content.isEmpty) 0L else sum * 1000L / content.length))
    }
  }

  test("PNM codec: write/parse round-trip, header comments, corruption rejected") {
    import graft.ops.PnmCodec
    val px = Array.tabulate[Byte](5 * 4 * 3)(i => ((i * 11) % 256).toByte)
    val img = PnmCodec.PnmImage(5, 4, 3, 255, px)
    val back = PnmCodec.parse(PnmCodec.write(img))
    assert(back.width == 5 && back.height == 4 && back.channels == 3)
    assert(back.pixels.sameElements(px))

    // grayscale P5 round-trips with channels = 1
    val gray = PnmCodec.parse(PnmCodec.write(PnmCodec.PnmImage(3, 2, 1, 255, px.take(6))))
    assert(gray.channels == 1 && gray.pixels.length == 6)

    // '#' comments anywhere in the header are legal per the Netpbm spec
    val commented = ("P6 # magic\n# a whole comment line\n 5 # width\n4\n255\n")
      .getBytes("US-ASCII") ++ px
    val tolerant = PnmCodec.parse(commented)
    assert(tolerant.width == 5 && tolerant.height == 4)
    assert(tolerant.sumPixels == img.sumPixels)

    // corruption fails loudly: bad magic, short raster, 2-byte maxval
    intercept[IllegalArgumentException] { PnmCodec.parse("not an image".getBytes) }
    intercept[IllegalArgumentException] { PnmCodec.parse(PnmCodec.write(img).dropRight(4)) }
    intercept[IllegalArgumentException] {
      PnmCodec.parse("P6\n2 2\n65535\n".getBytes("US-ASCII") ++ new Array[Byte](24))
    }
  }

  test("imageInfo parses real PNM fixtures distributively and exactly") {
    val info = Multimodal.imageInfo(Multimodal.syntheticPnmAssets(docs))
      .orderBy("asset_id").limit(10).collect()
    info.foreach { r =>
      val a = r.getAs[Long]("asset_id")
      val w = 4 + (a % 13).toInt; val h = 3 + (a % 11).toInt
      val ch = if (a % 2 == 0) 3 else 1
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      assert(r.getAs[Int]("channels") == ch && r.getAs[Int]("maxval") == 255)
      val expectedSum = (0 until w * h * ch).map(i => (a * 31 + i * 7) % 256).sum
      assert(r.getAs[Long]("sum_pixels") == expectedSum, s"asset $a")
    }
  }

  test("resize is a real nearest-neighbor resample over decoded pixels") {
    import graft.ops.PnmCodec
    val resized = Multimodal.resizeImages(Multimodal.syntheticPnmAssets(docs), 8, 6)
      .orderBy("asset_id").limit(6).collect()
    resized.foreach { row =>
      val a = row.getAs[Long]("asset_id")
      val w = 4 + (a % 13).toInt; val h = 3 + (a % 11).toInt
      val ch = if (a % 2 == 0) 3 else 1
      val img = PnmCodec.parse(row.getAs[Array[Byte]]("content"))
      assert(img.width == 8 && img.height == 6 && img.channels == ch)
      // pixel-exact: target (ty,tx,c) copies source (ty*h/6, tx*w/8, c)
      for (ty <- 0 until 6; tx <- 0 until 8; c <- 0 until ch) {
        val srcIdx = ((ty * h / 6) * w + (tx * w / 8)) * ch + c
        val expected = ((a * 31 + srcIdx.toLong * 7) % 256).toInt
        val got = img.pixels((ty * 8 + tx) * ch + c) & 0xff
        assert(got == expected, s"asset $a pixel ($ty,$tx,$c)")
      }
    }
  }

  test("Y4M codec: write/parse round-trip, param tolerance, corruption rejected") {
    import graft.ops.Y4mCodec
    val fb = Y4mCodec.frameBytes(8, 6, "420")
    assert(fb == 8 * 6 + 2 * (4 * 3))
    val frames = Vector.tabulate(3)(f =>
      Array.tabulate[Byte](fb)(i => ((f * 50 + i * 3) % 256).toByte))
    val v = Y4mCodec.Y4mVideo(8, 6, 25, 1, "420", frames)
    val back = Y4mCodec.parse(Y4mCodec.write(v))
    assert(back.width == 8 && back.height == 6 && back.fpsNum == 25 && back.fpsDen == 1)
    assert(back.nFrames == 3 && back.colorspace == "420")
    (0 until 3).foreach(f => assert(back.frames(f).sameElements(frames(f))))
    assert(back.durationMs == 3 * 1000 / 25)
    assert(back.lumaFrame(1).sameElements(frames(1).take(48)))

    // other subsamplings size their planes correctly
    assert(Y4mCodec.frameBytes(8, 6, "422") == 48 + 2 * 4 * 6)
    assert(Y4mCodec.frameBytes(8, 6, "444") == 3 * 48)
    assert(Y4mCodec.frameBytes(8, 6, "mono") == 48)

    // unknown stream params (X...) and per-frame params are skipped per spec
    val loose = ("YUV4MPEG2 W2 H2 F30:1 Ip A1:1 C420 XYSCSS=420\n" +
      "FRAME Ipremixed\n").getBytes("US-ASCII") ++ Array.tabulate[Byte](6)(_.toByte)
    val lv = Y4mCodec.parse(loose)
    assert(lv.nFrames == 1 && lv.sumBytes == (0 until 6).sum)

    // corruption fails loudly: bad magic, odd 4:2:0 dims, truncated frame
    intercept[IllegalArgumentException] { Y4mCodec.parse("MPEG4 garbage\n".getBytes) }
    intercept[IllegalArgumentException] {
      Y4mCodec.parse("YUV4MPEG2 W3 H2 F30:1\nFRAME\n".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] { Y4mCodec.parse(Y4mCodec.write(v).dropRight(5)) }
  }

  test("codec guards: crafted huge sizes fail loudly instead of wrapping Int") {
    import graft.ops.{PnmCodec, WavCodec, Y4mCodec}
    // Y4M header claiming 65536x65536 mono: w*h == 2^32 wraps to 0 without
    // the Long guard and would "validate" zero-byte frames
    intercept[IllegalArgumentException] {
      Y4mCodec.parse("YUV4MPEG2 W65536 H65536 F30:1 Cmono\nFRAME\n".getBytes("US-ASCII"))
    }
    // WAV data chunk declaring ~Int.MaxValue bytes on a tiny payload: the
    // overrun check must not wrap negative and pass
    val wav = WavCodec.write(16000, 1, Array.tabulate[Short](8)(_.toShort))
    wav(43) = 0x7f.toByte // size LE bytes at offset 40..43 -> huge positive
    intercept[IllegalArgumentException] { WavCodec.parse(wav) }
    // resize to a box whose raster exceeds array bounds
    val img = PnmCodec.PnmImage(2, 2, 3, 255, new Array[Byte](12))
    intercept[IllegalArgumentException] { PnmCodec.resize(img, 65536, 65536) }
  }

  test("videoInfo parses real Y4M fixtures distributively and exactly") {
    val info = Multimodal.videoInfo(Multimodal.syntheticY4mAssets(docs))
      .orderBy("asset_id").limit(10).collect()
    assert(info.nonEmpty)
    info.foreach { r =>
      val a = r.getAs[Long]("asset_id")
      val w = 8 + ((a % 5) * 2).toInt; val h = 6 + ((a % 4) * 2).toInt
      val n = ((a % 6) + 2).toInt; val num = 5 + (a % 5).toInt
      val fb = w * h * 3 / 2
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      assert(r.getAs[Int]("fps_num") == num && r.getAs[Int]("fps_den") == 1)
      assert(r.getAs[Long]("n_frames") == n)
      assert(r.getAs[Long]("duration_ms") == n.toLong * 1000 / num)
      val expectedSum = (0 until n).map(f =>
        (0 until fb).map(i => (a * 31 + f * 17 + i * 7) % 256).sum).sum
      assert(r.getAs[Long]("sum_bytes") == expectedSum, s"asset $a")
    }
  }

  test("videoFrameImages composes Y4M luma extraction into real PGM images") {
    val frames = Multimodal.videoFrameImages(
      Multimodal.syntheticY4mAssets(docs.limit(12)), everyK = 2)
    val rows = frames.orderBy("asset_id", "frame_idx").collect()
    rows.foreach { r =>
      val a = r.getAs[Long]("asset_id")
      val f = r.getAs[Long]("frame_idx")
      assert(f % 2 == 0, "only every 2nd frame is decoded")
      val img = graft.ops.PnmCodec.parse(r.getAs[Array[Byte]]("content"))
      val w = 8 + ((a % 5) * 2).toInt; val h = 6 + ((a % 4) * 2).toInt
      assert(img.width == w && img.height == h && img.channels == 1)
      // luma plane = first w*h bytes of the frame's deterministic fill
      val expectedSum = (0 until w * h).map(i => (a * 31 + f * 17 + i * 7) % 256).sum
      assert(img.sumPixels == expectedSum, s"asset $a frame $f")
    }
    // cadence: asset 0 has 2 frames -> 1 sampled; asset 5 has 7 -> 4 sampled
    val byAsset = rows.groupBy(_.getAs[Long]("asset_id")).map { case (a, rs) => (a, rs.length) }
    byAsset.foreach { case (a, cnt) =>
      val n = ((a % 6) + 2).toInt
      assert(cnt == (n + 1) / 2, s"asset $a: $cnt of $n frames sampled")
    }
  }

  test("frame sampling fans out metadata-only rows at the step cadence") {
    val frames = Multimodal.frameSample(assets, 250L)
    val one = frames.where(col("asset_id") === 2).orderBy("frame_idx").collect()
    // doc 2 is video with duration 1000*(1+2%30) = 3000 ms -> 12 frames @250ms
    assert(one.length == 12)
    assert(one.head.getAs[Long]("ts_ms") == 0L)
    assert(one.last.getAs[Long]("ts_ms") == 2750L)
  }

  test("audio chunking clips the final window to the duration") {
    val chunks = Multimodal.audioChunks(assets, 700L)
    val one = chunks.where(col("asset_id") === 1).orderBy("chunk_idx").collect()
    // doc 1 is audio with duration 2000 ms -> ceil(2000/700) = 3 chunks
    assert(one.length == 3)
    assert(one.last.getAs[Long]("end_ms") == 2000L)
    assert(one.last.getAs[Long]("start_ms") == 1400L)
  }
}

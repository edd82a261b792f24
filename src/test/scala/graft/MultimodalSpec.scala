package graft

import org.apache.spark.sql.functions._

/** Multimodal plumbing tests: binary payload schema, deterministic stub
  * decode, frame explosion shape. */
class MultimodalSpec extends SparkSpec {

  test("payload is BINARY and utf-8 byte length >= char length") {
    val df = q("mm01_binary_meta").build(spark, sf)
    val joined = df.join(Tables.t(spark, sf, "documents"), "doc_id")
    assert(joined.filter(col("n_bytes") < length(col("text"))).count() == 0)
    assert(df.schema("n_bytes").dataType.typeName == "long")
  }

  test("mixed-corpus image meta: deterministic; constructed-PNG rows " +
    "parse their encoded dims, text rows land in the stub's range") {
    val a = q("mm02_image_meta").build(spark, sf).orderBy("doc_id").collect()
    val b = q("mm02_image_meta").build(spark, sf).orderBy("doc_id").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.forall { r =>
      val id = r.getLong(0); val w = r.getInt(1); val h = r.getInt(2)
      if (id % 3 == 0) // constructed-PNG arm: dims recovered exactly
        w == (id % 300 + 10) && h == ((id * 5) % 200 + 10) &&
          r.getInt(3) == (if (id % 2 == 0) 1 else 4)
      else // text arm: md5-derived stub, fixed 3 channels
        w >= 32 && w < 640 && h >= 32 && h < 640 && r.getInt(3) == 3
    })
  }

  test("resize plan fits inside max dim, preserves orientation") {
    val rows = q("mm03_resize_plan").build(spark, sf).collect()
    assert(rows.forall { r =>
      val w = r.getInt(1); val h = r.getInt(2)
      w <= 256 && h <= 256 && w >= 1 && h >= 1
    })
  }

  test("frame sampling yields exactly nFrames per document") {
    val df = q("mm04_frame_hashes").build(spark, sf)
    assert(df.filter(col("n_frames") =!= 4).count() == 0)
    assert(df.count() == Tables.t(spark, sf, "documents").count())
  }

  // ---- real header parsing on hand-built byte literals ------------------

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le32(v: Long): Array[Byte] = be32(v).reverse
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Minimal valid PNG prefix: signature + IHDR chunk (length, tag,
    * width, height, bit depth, color type, compression, filter,
    * interlace) + a dummy CRC. */
  private def pngBytes(w: Long, h: Long, colorType: Int): Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte) ++ be32(13) ++ "IHDR".getBytes("US-ASCII") ++
      be32(w) ++ be32(h) ++ Array[Byte](8, colorType.toByte, 0, 0, 0) ++
      be32(0)

  /** Minimal BMP file+DIB header prefix (BITMAPINFOHEADER, size 40). */
  private def bmpBytes(w: Long, h: Long, bpp: Int): Array[Byte] =
    "BM".getBytes("US-ASCII") ++ le32(123) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(bpp)

  /** Minimal GIF header: version magic + logical screen descriptor
    * (LE u16 dims, packed/background/aspect tail). */
  private def gifBytes(w: Long, h: Long, v89: Boolean): Array[Byte] =
    (if (v89) "GIF89a" else "GIF87a").getBytes("US-ASCII") ++
      le16(w.toInt) ++ le16(h.toInt) ++
      Array(0xF7.toByte, 0x00.toByte, 0x00.toByte)

  private def decoded(payloads: Seq[Array[Byte]]): Seq[(Int, Int, Int)] = {
    val sq = spark; import sq.implicits._
    payloads.zipWithIndex.map { case (b, i) => (i, b) }
      .toDF("id", "bin")
      .select(col("id"), Multimodal.decodeHeader(col("bin")).as("m"))
      .orderBy("id")
      .collect()
      .map(r => {
        val m = r.getStruct(1)
        (m.getInt(0), m.getInt(1), m.getInt(2))
      }).toSeq
  }

  test("decodeHeader parses hand-built PNG IHDR headers (BE dims, " +
    "color-type channel map)") {
    assert(decoded(Seq(
      pngBytes(640, 480, colorType = 6),   // RGBA
      pngBytes(1, 1, colorType = 0),       // grayscale
      pngBytes(65537, 3, colorType = 2),   // RGB, width > 16 bits
      pngBytes(12, 34, colorType = 3),     // palette
      pngBytes(12, 34, colorType = 4)      // gray+alpha
    )) == Seq((640, 480, 4), (1, 1, 1), (65537, 3, 3), (12, 34, 1),
      (12, 34, 2)))
  }

  test("decodeHeader parses hand-built GIF87a/GIF89a screen " +
    "descriptors (LE dims, palette channels); a truncated GIF magic " +
    "falls back to the stub instead of reading past the buffer") {
    assert(decoded(Seq(
      gifBytes(2, 1, v89 = true),
      gifBytes(640, 400, v89 = false),
      gifBytes(65535, 65535, v89 = true)   // max LE u16 both dims
    )) == Seq((2, 1, 3), (640, 400, 3), (65535, 65535, 3)))
    // 12 bytes: magic + dims but a cut-off descriptor tail -> stub arm
    val truncated = "GIF89a".getBytes("US-ASCII") ++ le16(2) ++
      le16(1) ++ Array(0xF7.toByte, 0x00.toByte)
    val viaStub = decoded(Seq(truncated)).head
    val stub = decoded(Seq("GIF89a!!".getBytes("US-ASCII"))).head
    assert(viaStub._3 != 3 || viaStub != ((2, 1, 3)),
      s"truncated header must not parse as GIF: $viaStub")
    assert(decoded(Seq(truncated ++ Array(0x00.toByte))).head ==
      ((2, 1, 3)), "13 bytes is exactly enough")
    assert(stub._1 > 0 && stub._2 > 0, "stub stays plausible")
  }

  test("decodeHeader parses hand-built BMP DIB headers (LE dims, " +
    "top-down negative height, bpp channel map)") {
    assert(decoded(Seq(
      bmpBytes(800, 600, bpp = 24),
      bmpBytes(31, -32, bpp = 32),   // negative = top-down: |height|
      bmpBytes(7, 5, bpp = 8)
    )) == Seq((800, 600, 3), (31, 32, 4), (7, 5, 1)))
  }

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** A JPEG segment: FF <marker> <len incl. itself> <body>. */
  private def seg(marker: Int, body: Array[Byte]): Array[Byte] =
    Array(0xff.toByte, marker.toByte) ++ be16(body.length + 2) ++ body

  /** Minimal JPEG prefix: SOI, the given preamble segments, then a SOF
    * frame header (precision 8, BE dims, ncomp component specs). */
  private def jpegBytes(w: Int, h: Int, nComp: Int, sofMarker: Int = 0xc0,
      preamble: Seq[Array[Byte]] = Seq.empty): Array[Byte] =
    Array(0xff.toByte, 0xd8.toByte) ++
      preamble.flatten ++
      seg(sofMarker, Array[Byte](8) ++ be16(h) ++ be16(w) ++
        Array(nComp.toByte) ++
        Array.fill(nComp * 3)(0x11.toByte))

  private val jfifApp0 =
    seg(0xe0, "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0))

  test("decodeHeader parses hand-built JPEG SOF headers at variable " +
    "offsets (segment walk, BE dims, component-count channels)") {
    assert(decoded(Seq(
      // baseline JFIF, YCbCr
      jpegBytes(640, 480, nComp = 3, preamble = Seq(jfifApp0)),
      // progressive (SOF2) behind APP1 + COM + DQT segments
      jpegBytes(1920, 1080, nComp = 3, sofMarker = 0xc2,
        preamble = Seq(jfifApp0,
          seg(0xe1, Array.fill(40)(0x42.toByte)),          // APP1 (EXIF)
          seg(0xfe, "a comment".getBytes("US-ASCII")),     // COM
          seg(0xdb, Array.fill(65)(1.toByte)))),           // DQT
      // grayscale, no preamble (SOF directly after SOI)
      jpegBytes(8, 12, nComp = 1),
      // CMYK (Adobe), width exercising the high byte
      jpegBytes(300, 7, nComp = 4, sofMarker = 0xc1)
    )) == Seq((640, 480, 3), (1920, 1080, 3), (8, 12, 1), (300, 7, 4)))
  }

  test("JPEG-magic payloads without a parseable SOF fall back to the " +
    "stub (lost sync, SOS before SOF, truncated frame)") {
    val sq = spark; import sq.implicits._
    val payloads = Seq(
      // FFD8 then non-segment garbage: lost sync
      Array(0xff, 0xd8).map(_.toByte) ++
        "not a real jpeg body".getBytes("UTF-8"),
      // well-formed segments but SOS with no SOF before it
      Array(0xff.toByte, 0xd8.toByte) ++ jfifApp0 ++
        seg(0xda, Array[Byte](1, 1, 0, 0x3f, 0)) ++
        Array.fill(24)(0x55.toByte),
      // SOF truncated before the width field
      (Array(0xff.toByte, 0xd8.toByte) ++ jfifApp0 ++
        seg(0xc0, Array[Byte](8) ++ be16(480))).dropRight(1))
    val viaDecode = decoded(payloads)
    val viaStub = payloads.zipWithIndex.map { case (b, i) => (i, b) }
      .toDF("id", "bin")
      .select(col("id"), Multimodal.fakeDecode(col("bin")).as("m"))
      .orderBy("id").collect()
      .map(r => {
        val m = r.getStruct(1)
        (m.getInt(0), m.getInt(1), m.getInt(2))
      }).toSeq
    assert(viaDecode == viaStub)
  }

  test("decodeHeader falls back to the deterministic stub when magic " +
    "dispatch fails (text bytes, BM-prefixed text, truncated PNG)") {
    val sq = spark; import sq.implicits._
    val noMagic = Seq(
      "plain text document".getBytes("UTF-8"),
      // starts with BM but the DIB-size second factor rejects it
      "BMW dealers in town announced today that the market".getBytes("UTF-8"),
      // real PNG signature but truncated before the header fields
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val viaDecode = decoded(noMagic)
    val viaStub = noMagic.zipWithIndex.map { case (b, i) => (i, b) }
      .toDF("id", "bin")
      .select(col("id"), Multimodal.fakeDecode(col("bin")).as("m"))
      .orderBy("id").collect()
      .map(r => {
        val m = r.getStruct(1)
        (m.getInt(0), m.getInt(1), m.getInt(2))
      }).toSeq
    assert(viaDecode == viaStub)
  }

  /** Canonical 44-byte PCM WAV header + `dataBytes` of payload. */
  private def wavBytes(rate: Long, ch: Int, bits: Int,
      dataBytes: Long): Array[Byte] = {
    val byteRate = rate * ch * bits / 8
    "RIFF".getBytes("US-ASCII") ++ le32(36 + dataBytes) ++
      "WAVEfmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++
      le16(ch) ++ le32(rate) ++ le32(byteRate) ++
      le16(ch * bits / 8) ++ le16(bits) ++
      "data".getBytes("US-ASCII") ++ le32(dataBytes) ++
      Array.fill(dataBytes.toInt)(0x7f.toByte)
  }

  test("decodeAudioHeader parses hand-built canonical PCM WAV headers " +
    "(LE fields) and the duration accounting follows the byte rate") {
    val sq = spark; import sq.implicits._
    val rows = Seq(
      wavBytes(44100, ch = 2, bits = 16, dataBytes = 176400), // 1.0 s
      wavBytes(8000, ch = 1, bits = 8, dataBytes = 4000)      // 0.5 s
    ).zipWithIndex.map { case (b, i) => (i, b) }.toDF("id", "bin")
      .select(col("id"),
        Multimodal.decodeAudioHeader(col("bin")).as("m"))
      .select(col("id"), col("m.sample_rate"), col("m.channels"),
        col("m.bits"), col("m.data_bytes"),
        Multimodal.audioSeconds(col("m")).as("s"))
      .orderBy("id").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4),
        r.getDouble(5)))
    assert(rows.toSeq == Seq(
      (44100, 2, 16, 176400L, 1.0), (8000, 1, 8, 4000L, 0.5)))
  }

  test("decodeAudioHeader falls back to the deterministic audio stub on " +
    "non-WAV payloads (text bytes, RIFF-prefixed text, non-PCM format)") {
    val sq = spark; import sq.implicits._
    val nonPcm = wavBytes(44100, 2, 16, 8)
    nonPcm(20) = 3 // format tag 3 = IEEE float, not PCM 1
    val noMagic = Seq(
      "an ordinary text document payload here".getBytes("UTF-8"),
      "RIFF through the countryside went the wagon".getBytes("UTF-8"),
      nonPcm)
    def fields(c: org.apache.spark.sql.Column) = {
      noMagic.zipWithIndex.map { case (b, i) => (i, b) }.toDF("id", "bin")
        .select(col("id"), c.as("m"))
        .select(col("id"), col("m.sample_rate"), col("m.channels"),
          col("m.bits"), col("m.data_bytes"))
        .orderBy("id").collect()
        .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
        .toSeq
    }
    assert(fields(Multimodal.decodeAudioHeader(col("bin"))) ==
      fields(Multimodal.fakeAudioDecode(col("bin"))))
  }

  test("mm10 keyframe sampling keeps exactly the scene-opening frames: " +
    "scene length 1/2/3 (by doc_id%3) yields 12/6/4 keyframes at the " +
    "right offsets") {
    val rows = q("mm10_keyframe_sample").build(spark, sf)
      .select("doc_id", "frame_no").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (docId, kept) =>
      val len = 1 + (docId % 3)
      val want = (0L until 12L by len).toSet
      assert(kept.map(_._2).toSet == want,
        s"doc $docId (scene len $len): got ${kept.map(_._2).sorted.toSeq}")
    }
  }

  test("mp4 box walk: hand-built stream parses exactly; truncated and " +
    "undersized boxes freeze to the malformed terminal with the boxes " +
    "seen so far") {
    val sq = spark; import sq.implicits._
    import org.apache.spark.sql.functions.{col, unhex}
    // ftyp(16) + moov(8) + mdat(12: 4 payload bytes)
    val good = "00000010" + "66747970" + "69736F6D" + "00000000" +
      "00000008" + "6D6F6F76" + "0000000C" + "6D646174" + "AABBCCDD"
    val trunc = good.dropRight(4)   // mdat overruns by 2 bytes
    val badsize = "00000004" + "66747970" // size < 8 is illegal
    val got = Seq((1, good), (2, trunc), (3, badsize)).toDF("id", "hx")
      .select(col("id"), Multimodal.mp4BoxStats(unhex(col("hx"))).as("b"))
      .collect()
      .map(r => r.getInt(0) -> {
        val b = r.getStruct(1)
        (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
      }).toMap
    assert(got(1) == ((0L, 3L, 1L, 4L)), got(1).toString)  // clean end
    assert(got(2) == ((-1L, 2L, 1L, 0L)), got(2).toString) // truncated
    assert(got(3) == ((-1L, 0L, 0L, 0L)), got(3).toString) // bad size
  }

  test("mp4 box walk: the legal special size encodings parse — size 0 " +
    "(to end of file) and size 1 (64-bit largesize, 16-byte header)") {
    val sq = spark; import sq.implicits._
    import org.apache.spark.sql.functions.{col, unhex}
    val ftyp = "00000010" + "66747970" + "69736F6D" + "00000000"
    // final mdat with size=0: extends to EOF, 4 payload bytes
    val size0 = ftyp + "00000000" + "6D646174" + "AABBCCDD"
    // mdat with size=1: largesize=20 = 16-byte header + 4 payload bytes
    val size1 = ftyp + "00000001" + "6D646174" +
      "0000000000000014" + "AABBCCDD"
    val got = Seq((1, size0), (2, size1)).toDF("id", "hx")
      .select(col("id"), Multimodal.mp4BoxStats(unhex(col("hx"))).as("b"))
      .collect()
      .map(r => r.getInt(0) -> {
        val b = r.getStruct(1)
        (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
      }).toMap
    assert(got(1) == ((0L, 2L, 0L, 4L)), got(1).toString)
    assert(got(2) == ((0L, 2L, 0L, 4L)), got(2).toString)
  }

  test("mp4 box walk: an adversarial 64-bit largesize near " +
    "Long.MaxValue lands on the -1 malformed terminal (no signed " +
    "overflow slipping past the overrun check)") {
    val sq = spark; import sq.implicits._
    import org.apache.spark.sql.functions.{col, unhex}
    val ftyp = "00000010" + "66747970" + "69736F6D" + "00000000"
    // size=1 then largesize = 0x7FFFFFFFFFFFFFF0: off + size would
    // overflow negative; the size > olen screen must catch it first.
    val evil = ftyp + "00000001" + "6D646174" +
      "7FFFFFFFFFFFFFF0" + "AABBCCDD"
    val got = Seq((1, evil)).toDF("id", "hx")
      .select(col("id"), Multimodal.mp4BoxStats(unhex(col("hx"))).as("b"))
      .collect().map { r =>
        val b = r.getStruct(1)
        (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
      }.head
    assert(got == ((-1L, 1L, 0L, 0L)), got.toString)
  }

  test("srtCues parses a hand-written subtitle file (timecode decode " +
    "to ms) and drops malformed blocks") {
    val sq = spark; import sq.implicits._
    import org.apache.spark.sql.functions.col
    val srt = "1\n00:00:01,000 --> 00:00:03,500\nHello world\n\n" +
      "garbage block without a timecode\n\n" +
      "2\n01:02:03,004 --> 01:02:04,500\nSecond cue"
    val got = Multimodal.srtCues(
        Seq((7L, srt)).toDF("doc_id", "payload"), col("payload"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(got.toSeq.sortBy(_._1) == Seq(
      (1L, 1000L, 3500L, "Hello world"),
      (2L, 3723004L, 3724500L, "Second cue")), got.toSeq.toString)
  }

  test("srtCues rejects a malformed block with an embedded cue-shaped " +
    "tail (anchored regex), and >99h timecodes round-trip") {
    val sq = spark; import sq.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    // junk BEFORE the index: the block is malformed and must drop even
    // though a valid-looking cue starts mid-block
    val bad = "NOTE leftover header\n3\n00:00:01,000 --> 00:00:02,000\nx"
    val cues = Multimodal.srtCues(
      Seq((1L, bad)).toDF("doc_id", "payload"), col("payload"))
    assert(cues.count() == 0, "embedded cue-shaped tail must not parse")
    // 100h = 360_000_000 ms: encoder widens hours, parser accepts them
    val tc = Seq((1L, 0L)).toDF("doc_id", "z")
      .select(Multimodal.srtTimecode(lit(360000000L) + col("z")).as("t"))
      .collect().head.getString(0)
    assert(tc == "100:00:00,000", tc)
    val rt = Multimodal.srtCues(
      Seq((1L, s"1\n$tc --> 100:00:01,500\nlate cue"))
        .toDF("doc_id", "payload"), col("payload"))
      .collect().head
    assert(rt.getLong(2) == 360000000L && rt.getLong(3) == 360001500L,
      rt.toString)
  }

  test("mp3FrameStats on byte literals: FFFB9000 reads 128 kbps / " +
    "44100 Hz / stereo / frame 417; padding adds a byte; bitrate " +
    "index 15, reserved sample rate, truncation, and a non-sync " +
    "prefix all read malformed") {
    val sq = spark; import sq.implicits._
    def parse(hexStr: String) = Seq(Tuple1(hexStr)).toDF("h")
      .select(Multimodal.mp3FrameStats(unhex(col("h"))).as("m"))
      .select("m.*").collect().head
    val ok = parse("FFFB9000")
    assert(ok.getBoolean(0) && ok.getInt(1) == 128 &&
      ok.getInt(2) == 44100 && ok.getInt(3) == 2 &&
      ok.getInt(4) == 0 && ok.getLong(5) == 417L, ok.toString)
    // padding bit set: same frame math + 1; mono mode bits 11
    val padded = parse("FFFB92C0")
    assert(padded.getBoolean(0) && padded.getInt(4) == 1 &&
      padded.getInt(3) == 1 && padded.getLong(5) == 417L,
      padded.toString)
    for (bad <- Seq("FFFBF000", // bitrate index 15 = invalid
      "FFFB9C00",               // sample-rate index 3 = reserved
      "FFFB",                   // truncated
      "FEFB9000",               // no sync
      "48656C6C6F"))            // "Hello" text bytes
      assert(!parse(bad).getBoolean(0), s"$bad must be malformed")
  }

  test("flacStreamInfo on byte literals: a 44.1 kHz stereo 16-bit " +
    "stream with a 36-bit sample count crossing the nibble boundary " +
    "decodes exactly (incl. the seconds division); wrong magic, " +
    "non-STREAMINFO type, wrong block length, truncation, and text " +
    "bytes all read malformed") {
    val sq = spark; import sq.implicits._
    def parse(hexStr: String) = Seq(Tuple1(hexStr)).toDF("h")
      .select(Multimodal.flacStreamInfo(unhex(col("h"))).as("m"))
      .select("m.*").collect().head
    // sr 44100, ch 2, bps 16, ts 5*2^32+4410000 (high nibble = 5
    // exercises the straddle), min/max block 4096/4160, last flag set
    val ok = parse("664C614380000022100010400000000000000AC442F5" +
      "00434A9000000000000000000000000000000000")
    assert(ok.getBoolean(0) && ok.getInt(1) == 1 &&
      ok.getInt(2) == 4096 && ok.getInt(3) == 4160 &&
      ok.getInt(4) == 44100 && ok.getInt(5) == 2 &&
      ok.getInt(6) == 16 && ok.getLong(7) == 21479246480L &&
      ok.getLong(8) == 487057L, ok.toString)
    // last flag clear reads 0 and stays well-formed
    val nf = parse("664C614300000022100010400000000000000AC442F5" +
      "00434A9000000000000000000000000000000000")
    assert(nf.getBoolean(0) && nf.getInt(1) == 0, nf.toString)
    for (bad <- Seq(
      "664C614480000022100010400000000000000AC442F5" +
        "00434A9000000000000000000000000000000000", // magic fLaD
      "664C614381000022100010400000000000000AC442F5" +
        "00434A9000000000000000000000000000000000", // block type 1
      "664C614380000021100010400000000000000AC442F5" +
        "00434A9000000000000000000000000000000000", // length 33
      "664C61438000002210001040",                   // truncated
      "48656C6C6F20776F726C64"))                    // text bytes
      assert(!parse(bad).getBoolean(0), s"$bad must be malformed")
  }

  test("tiffMeta on byte literals: the same logical file parses " +
    "through BOTH byte orders (SHORT width left-justified, LONG " +
    "height, Compression tag skipped); wrong magic, a dimension tag " +
    "missing, truncation, and text bytes read malformed") {
    val sq = spark; import sq.implicits._
    def parse(hexStr: String) = Seq(Tuple1(hexStr)).toDF("h")
      .select(Multimodal.tiffMeta(unhex(col("h"))).as("m"))
      .select("m.*").collect().head
    val leBody = "0300" +
      "0001" + "0300" + "01000000" + "4001" + "0000" + // width 320
      "0101" + "0400" + "01000000" + "F0000000" +      // height 240
      "0301" + "0300" + "01000000" + "0100" + "0000" + // compression
      "00000000"
    val beBody = "0003" +
      "0100" + "0003" + "00000001" + "0140" + "0000" +
      "0101" + "0004" + "00000001" + "000000F0" +
      "0103" + "0003" + "00000001" + "0001" + "0000" +
      "00000000"
    val le = parse("49492A00" + "08000000" + leBody)
    assert(le.getBoolean(0) && le.getString(1) == "II" &&
      le.getInt(2) == 3 && le.getLong(3) == 320L &&
      le.getLong(4) == 240L, le.toString)
    val be = parse("4D4D002A" + "00000008" + beBody)
    assert(be.getBoolean(0) && be.getString(1) == "MM" &&
      be.getInt(2) == 3 && be.getLong(3) == 320L &&
      be.getLong(4) == 240L, "byte orders must parse identically: " +
      be.toString)
    for (bad <- Seq(
      "49492B00" + "08000000" + leBody,            // magic 43
      "49492A00" + "08000000" + "0100" +           // width only —
        "0001" + "0300" + "01000000" + "4001" +
        "0000" + "00000000",                       // height missing
      "49492A00" + "08000000" + "0300" + "0001",   // truncated table
      "48656C6C6F20776F726C64"))                   // text bytes
      assert(!parse(bad).getBoolean(0), s"$bad must be malformed")
  }

  test("webpMeta on byte literals: all three variant grammars parse " +
    "(VP8 masks its 2 upscale bits, VP8L unpacks the LE32 bitfield, " +
    "VP8X reads 24-bit dims past the LE16 range); bad sync, bad " +
    "signature, truncation, and text bytes read malformed") {
    val sq = spark; import sq.implicits._
    def parse(hexStr: String) = Seq(Tuple1(hexStr)).toDF("h")
      .select(Multimodal.webpMeta(unhex(col("h"))).as("m"))
      .select("m.*").collect().head
    def read(r: org.apache.spark.sql.Row) =
      (r.getBoolean(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getInt(4))
    val pre = "52494646" + "16000000" + "57454250"
    // VP8 lossy, 320x240; then the same with both upscale bits set in
    // the width field (0xC140 LE) — the 14-bit mask must strip them
    val vp8 = "56503820" + "0A000000" + "000000" + "9D012A"
    assert(read(parse(pre + vp8 + "4001" + "F000")) ==
      ((true, "vp8", 320L, 240L, 0)))
    assert(read(parse(pre + vp8 + "40C1" + "F000")) ==
      ((true, "vp8", 320L, 240L, 0)), "upscale bits must be masked")
    // VP8L 100x50 alpha: bits = 99 | 49<<14 | 1<<28 = 0x100C4063
    assert(read(parse(pre + "5650384C" + "05000000" + "2F63400C10")) ==
      ((true, "vp8l", 100L, 50L, 1)))
    // VP8X 16384x2000 (needs the LE24 field), alpha flag 0x10
    assert(read(parse(pre + "56503858" + "0A000000" + "10" + "000000" +
      "FF3F00" + "CF0700")) == ((true, "vp8x", 16384L, 2000L, 1)))
    for (bad <- Seq(
      pre + vp8.dropRight(6) + "9D012B" + "4001F000", // bad VP8 sync
      pre + "5650384C" + "05000000" + "2E63400C10",   // bad VP8L sig
      "52494646",                                     // truncated
      "52494646160000005741564550",                   // RIFF but not WEBP
      "48656C6C6F20776F726C64"))                      // text bytes
      assert(!parse(bad).getBoolean(0), s"$bad must be malformed")
  }
}

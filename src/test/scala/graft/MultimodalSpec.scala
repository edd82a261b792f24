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

  test("stub decode is deterministic and in-range") {
    val a = q("mm02_image_meta").build(spark, sf).orderBy("doc_id").collect()
    val b = q("mm02_image_meta").build(spark, sf).orderBy("doc_id").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.forall { r =>
      val w = r.getInt(1); val h = r.getInt(2)
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

  test("decodeHeader parses hand-built BMP DIB headers (LE dims, " +
    "top-down negative height, bpp channel map)") {
    assert(decoded(Seq(
      bmpBytes(800, 600, bpp = 24),
      bmpBytes(31, -32, bpp = 32),   // negative = top-down: |height|
      bmpBytes(7, 5, bpp = 8)
    )) == Seq((800, 600, 3), (31, 32, 4), (7, 5, 1)))
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
}

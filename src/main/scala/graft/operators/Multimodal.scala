package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column support (driver north star; absent from the
  * reference): image/audio/video payloads are opaque BINARY columns with
  * typed metadata travelling beside them. The Spark-side plumbing —
  * binary schema, per-row metadata extraction, frame explosion and
  * re-aggregation, partition behavior — is real and tested, and
  * [[Multimodal.decodeHeader]] genuinely parses PNG IHDR / BMP DIB
  * headers (plain integer fields, no codec library needed). Payloads
  * matching neither magic fall back to the clearly-marked deterministic
  * stub (`fakeDecode`) — compressed-codec decode needs image/audio
  * libraries this container doesn't have. Swapping that fallback for a
  * real decoder is a drop-in replacement of one expression (or a
  * mapPartitions batch-decode) — nothing else in the pipeline changes.
  *
  * Scale: everything here is per-row expression work over a binary column
  * — single scan, no shuffle, codegen-friendly, and at 100 TB the binary
  * payloads stream through executors without ever landing on the driver.
  * Frame explosion multiplies rows by nFrames before the per-frame work,
  * which is the same row-amplification discipline as LSH banding: bounded,
  * predictable, and shuffle-free until an explicit aggregation.
  */
object Multimodal {

  /** The opaque payload: utf-8 bytes of the text stand in for real media
    * bytes — same column type (BINARY), same plumbing. */
  def payload(text: Column): Column = text.cast("binary")

  /** Container-level metadata real decoders also surface: exact byte size
    * and leading magic bytes (how real pipelines sniff JPEG/PNG/RIFF). */
  def byteSize(bin: Column): Column = octet_length(bin).cast("long")
  /** First 4 bytes as hex (hex-then-slice: DuckDB can't substring a BLOB,
    * and both engines hex in uppercase — keeps the oracle expressible). */
  def magic(bin: Column): Column = substring(hex(bin), 1, 8)

  /** 60-bit bigint from a slice of the payload's md5 hex — the
    * oracle-stateable hash basis shared with t05b/t10: DuckDB computes
    * the identical value as `CAST(('0x' || substr(md5(x), off, 15)) AS
    * BIGINT)`, which is what lets the stub-decode fallbacks below sit
    * under the driver's hash gate (xxhash64 has no DuckDB twin). */
  private def md5Slice(bin: Column, off: Int): Column =
    conv(substring(md5(bin), off, 15), 16, 10).cast("long")

  /** STUB DECODE — deterministic fake of an image decode. A real
    * implementation would parse the codec header ([[decodeHeader]] does,
    * for PNG/BMP/JPEG); this derives plausible (width, height, channels)
    * from md5 slices of the bytes so the downstream schema/partitioning/
    * aggregation plumbing is exercised honestly on payloads with no real
    * magic — and, since both engines compute the identical md5
    * arithmetic, the fallback arm is itself DuckDB-oracle-stateable
    * (mm02/mm03 run it under the hash gate). */
  def fakeDecode(bin: Column): Column = struct(
    (md5Slice(bin, 1) % 608L + 32L).cast("int").as("width"),
    (md5Slice(bin, 16) % 608L + 32L).cast("int").as("height"),
    lit(3).as("channels"))

  // ---- real header parsing (PNG IHDR / BMP DIB) -------------------------
  // Plain fixed-offset integer fields — no codec library needed, and the
  // byte plumbing is pure codegen'd built-ins (substring on BINARY is
  // byte-addressed; hex → conv parses the big-endian value directly,
  // little-endian fields recombine per-byte). All offsets 1-based to
  // match substring.

  /** Big-endian uint32 at byte offset `off` (PNG's integer encoding). */
  private def beU32(bin: Column, off: Int): Column =
    conv(hex(substring(bin, off, 4)), 16, 10).cast("long")
  /** Single byte as 0..255. */
  private def byteAt(bin: Column, off: Int): Column =
    conv(hex(substring(bin, off, 1)), 16, 10).cast("long")
  /** Little-endian uint32 (BMP's integer encoding). */
  private def leU32(bin: Column, off: Int): Column =
    byteAt(bin, off) + byteAt(bin, off + 1) * 256L +
      byteAt(bin, off + 2) * 65536L + byteAt(bin, off + 3) * 16777216L
  /** Little-endian uint16. */
  private def leU16(bin: Column, off: Int): Column =
    byteAt(bin, off) + byteAt(bin, off + 1) * 256L
  /** Reinterpret a uint32 column as signed int32 (BMP dims are signed;
    * a negative height means a top-down bitmap). */
  private def s32(u: Column): Column =
    when(u > 2147483647L, u - 4294967296L).otherwise(u)

  // ---- JPEG SOF scan ----------------------------------------------------
  // JPEG dims live in a Start-Of-Frame segment at a VARIABLE offset, so
  // unlike PNG/BMP the parse is a bounded segment walk, not fixed-offset
  // arithmetic: after the FFD8 SOI, each segment is FF <marker> <len:u16be
  // incl. itself>, and the walk hops `off += 2 + len` until it lands on a
  // SOF marker (C0 baseline / C1 extended / C2 progressive / C3 lossless
  // — C4/C8/CC are DHT/JPG/DAC, not frames). The walk is an `aggregate`
  // HOF over a fixed 24-hop sequence (APPn/COM/DQT/DHT preambles from
  // real encoders are well under that), with the state = next segment
  // offset, negated once found (frozen), 0 once lost sync. All offsets
  // 1-based; dynamic-offset reads use the Column-pos substring overload.

  /** Little-endian hex text of a u32/u16 value — the payload-CONSTRUCTION
    * side of [[leU32]]/[[leU16]], used by the round-trip gate entries to
    * hex-build BMP/WAV headers before `unhex`. */
  private[graft] def le32hexCol(v: Column): Column = {
    val be = lpad(hex(v), 8, "0")
    concat(substring(be, 7, 2), substring(be, 5, 2),
      substring(be, 3, 2), substring(be, 1, 2))
  }
  private[graft] def le16hexCol(v: Column): Column = {
    val be = lpad(hex(v), 4, "0")
    concat(substring(be, 3, 2), substring(be, 1, 2))
  }
  private[graft] def le24hexCol(v: Column): Column = {
    val be = lpad(hex(v), 6, "0")
    concat(substring(be, 5, 2), substring(be, 3, 2), substring(be, 1, 2))
  }

  /** Hex text of a minimal PNG signature + IHDR prefix (width, height,
    * color-type hex byte) — the payload-CONSTRUCTION twin of
    * [[decodeHeader]]'s PNG arm, shared by every constructed-payload gate
    * (mm02/mm03/mm07/mm09) so the encode and parse sides can never
    * desynchronize between entries. */
  private[graft] def pngHex(w: Column, h: Column, ctHex: Column): Column =
    concat(lit("89504E470D0A1A0A"), lit("0000000D"), lit("49484452"),
      lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"), lit("08"), ctHex,
      lit("000000"))

  /** Hex text of a canonical 44-byte PCM WAV header (16-bit samples) —
    * the construction twin of [[decodeAudioHeader]], shared by
    * mm05/mm08. */
  private[graft] def wavHex(rate: Column, ch: Column, db: Column): Column =
    concat(
      lit("52494646"), le32hexCol(db + 36),
      lit("57415645666D7420"), le32hexCol(lit(16)),
      lit("0100"), le16hexCol(ch),
      le32hexCol(rate), le32hexCol(rate * ch * 2),
      le16hexCol(ch * 2), lit("1000"),
      lit("64617461"), le32hexCol(db))

  /** Byte as 0..255 at a DYNAMIC 1-based offset. */
  private def dynByte(bin: Column, off: Column): Column =
    conv(hex(substring(bin, off.cast("int"), lit(1))), 16, 10).cast("long")
  /** Big-endian uint16 at a DYNAMIC 1-based offset. */
  private def dynBeU16(bin: Column, off: Column): Column =
    conv(hex(substring(bin, off.cast("int"), lit(2))), 16, 10).cast("long")

  /** 1-based offset of the first SOF marker's FF byte, negated (< 0 =
    * found); 0 or positive = no SOF within the hop budget / lost sync. */
  private def sofScan(bin: Column): Column =
    aggregate(sequence(lit(1), lit(24)), lit(3L), (off, _) => {
      val mk = dynByte(bin, off + 1)
      when(off <= 0, off)                                  // settled
        .when(off + 9 > octet_length(bin), lit(0L))        // truncated
        .when(dynByte(bin, off) =!= 0xFF, lit(0L))         // lost sync
        .when(mk.isin(0xC0L, 0xC1L, 0xC2L, 0xC3L), -off)   // SOF: freeze
        .when(mk === 0xDAL, lit(0L))      // SOS: scan data, no SOF seen
        .otherwise(off + 2 + dynBeU16(bin, off + 2))       // skip segment
    })

  /** REAL magic-dispatched header decode for the three formats whose
    * headers need no codec library:
    *
    *  - PNG: 8-byte signature `89 50 4E 47 0D 0A 1A 0A`, then the IHDR
    *    chunk at a FIXED position (PNG spec: IHDR must be first) —
    *    width/height are big-endian uint32 at offsets 17/21, color type
    *    at 26 maps to channels (0 gray→1, 2 rgb→3, 3 palette→1,
    *    4 gray+alpha→2, 6 rgba→4).
    *  - BMP: `BM` magic, then the DIB header — width/height are
    *    little-endian int32 at offsets 19/23 (|height|: negative =
    *    top-down row order, same pixel dims), bits-per-pixel uint16 at
    *    29 maps to channels (8→1, 24→3, 32→4). The DIB size field at
    *    offset 15 must be a known header size (40/108/124) — the same
    *    second factor real sniffers require, so text that merely starts
    *    with "BM" cannot be mis-parsed.
    *
    * Payloads matching neither magic keep the [[fakeDecode]] stub — the
    * honest container-constrained boundary (no codec libs here), now at
    * the same place a real pipeline puts it: after magic dispatch fails.
    * Same struct schema as fakeDecode, so every downstream consumer
    * (mm02/mm03 plumbing, resize planning) is unchanged. */
  def decodeHeader(bin: Column): Column = {
    val isPng = octet_length(bin) >= 26 &&
      hex(substring(bin, 1, 8)) === "89504E470D0A1A0A" &&
      hex(substring(bin, 13, 4)) === "49484452"
    val colorType = byteAt(bin, 26)
    val pngChannels = when(colorType === 0, 1).when(colorType === 2, 3)
      .when(colorType === 3, 1).when(colorType === 4, 2)
      .when(colorType === 6, 4).otherwise(3)
    val dibSize = leU32(bin, 15)
    val isBmp = octet_length(bin) >= 30 &&
      hex(substring(bin, 1, 2)) === "424D" &&
      (dibSize === 40L || dibSize === 108L || dibSize === 124L)
    val bpp = leU16(bin, 29)
    val bmpChannels = when(bpp === 8, 1).when(bpp === 24, 3)
      .when(bpp === 32, 4).otherwise(3)
    // JPEG: FFD8 SOI magic + a located SOF frame segment (sofScan).
    // Frame layout after the FF Cx marker at |sof|: len(2) precision(1)
    // height:u16be(+5) width:u16be(+7) ncomponents(+9) — 1 gray, 3 YCbCr,
    // 4 CMYK. Dims of 0 (DNL-deferred height) fall back to the stub.
    val sof = sofScan(bin)
    val sOff = -sof
    val jH = dynBeU16(bin, sOff + 5)
    val jW = dynBeU16(bin, sOff + 7)
    val nComp = dynByte(bin, sOff + 9)
    val isJpeg = octet_length(bin) >= 13 &&
      hex(substring(bin, 1, 2)) === "FFD8" &&
      sof < 0 && jW > 0 && jH > 0
    val jpegChannels = when(nComp === 1, 1).when(nComp === 3, 3)
      .when(nComp === 4, 4).otherwise(3)
    // GIF87a/GIF89a: 6-byte version magic, then the logical screen
    // descriptor — width/height as LE u16 at offsets 7/9 (13 bytes
    // total with the packed/background/aspect tail, hence the length
    // floor). Channels report 3: GIF pixels index an RGB palette;
    // transparency lives in a later extension block, not here.
    val isGif = octet_length(bin) >= 13 &&
      (hex(substring(bin, 1, 6)) === "474946383761" ||
        hex(substring(bin, 1, 6)) === "474946383961")
    when(isPng, struct(
      beU32(bin, 17).cast("int").as("width"),
      beU32(bin, 21).cast("int").as("height"),
      pngChannels.cast("int").as("channels")))
      .when(isBmp, struct(
        s32(leU32(bin, 19)).cast("int").as("width"),
        abs(s32(leU32(bin, 23))).cast("int").as("height"),
        bmpChannels.cast("int").as("channels")))
      .when(isJpeg, struct(
        jW.cast("int").as("width"),
        jH.cast("int").as("height"),
        jpegChannels.cast("int").as("channels")))
      .when(isGif, struct(
        leU16(bin, 7).cast("int").as("width"),
        leU16(bin, 9).cast("int").as("height"),
        lit(3).cast("int").as("channels")))
      .otherwise(fakeDecode(bin))
  }

  /** STUB AUDIO DECODE — deterministic fake for payloads that are not
    * real audio containers (same role as [[fakeDecode]] for images):
    * plausible (sample_rate, channels, bits, data_bytes) from md5
    * slices, so the downstream duration/cost accounting plumbing runs
    * honestly on the text-bytes corpus AND the fallback arm is
    * oracle-stateable (mm05 runs it under the hash gate). */
  def fakeAudioDecode(bin: Column): Column = struct(
    element_at(typedlit(Seq(8000, 16000, 44100)),
      (md5Slice(bin, 1) % 3L + 1L).cast("int")).as("sample_rate"),
    (md5Slice(bin, 16) % 2L + 1L).cast("int").as("channels"),
    lit(16).as("bits"),
    byteSize(bin).as("data_bytes"))

  /** REAL WAV (RIFF/PCM) header decode — the audio twin of
    * [[decodeHeader]], and the same honest boundary: canonical-layout
    * PCM WAV headers are plain fixed-offset integer fields (RIFF spec),
    * parsed with codegen'd substring/byte arithmetic; anything else
    * falls back to [[fakeAudioDecode]]. Dispatch requires the full
    * canonical sandwich — "RIFF" + "WAVEfmt " + PCM format tag 1 + a
    * "data" chunk at offset 37 — so text bytes can never mis-parse.
    * Fields: channels LE-u16 @23, sample rate LE-u32 @25, bits LE-u16
    * @35, data byte count LE-u32 @41 (1-based offsets). */
  def decodeAudioHeader(bin: Column): Column = {
    val isWav = octet_length(bin) >= 44 &&
      hex(substring(bin, 1, 4)) === "52494646" &&
      hex(substring(bin, 9, 8)) === "57415645666D7420" &&
      leU16(bin, 21) === 1L &&
      hex(substring(bin, 37, 4)) === "64617461"
    when(isWav, struct(
      leU32(bin, 25).cast("int").as("sample_rate"),
      leU16(bin, 23).cast("int").as("channels"),
      leU16(bin, 35).cast("int").as("bits"),
      leU32(bin, 41).as("data_bytes")))
      .otherwise(fakeAudioDecode(bin))
  }

  /** Playback seconds implied by an audio-meta struct: data_bytes over
    * the PCM byte rate (rate × channels × bits/8), floored at 1e-4 s.
    * Floor — not round — because `round(double, 4)` is cross-engine
    * tie-UNSAFE: Spark rounds the double's shortest decimal rendering
    * (BigDecimal half-up → 172/16000 = "0.01075" → 0.0108) while DuckDB
    * rounds the binary value (→ 0.0107). floor of the identical IEEE
    * quotient has no tie semantics at all: both engines floor the same
    * double to the same integral value (Spark's floor yields LONG, cast
    * back; ≤1e9 ten-thousandths stays exactly representable). */
  def audioSeconds(meta: Column): Column =
    floor(meta.getField("data_bytes").cast("double") * 10000.0 /
      (meta.getField("sample_rate").cast("double") *
        meta.getField("channels") * (meta.getField("bits") / lit(8))))
      .cast("double") / 10000.0

  /** STUB RESIZE — metadata-only: computes the target dims a real resize
    * kernel would produce (fit inside maxDim, aspect preserved). */
  def resizePlan(meta: Column, maxDim: Int): Column = {
    val w = meta.getField("width")
    val h = meta.getField("height")
    val scale = least(lit(maxDim) / greatest(w, h).cast("double"), lit(1.0))
    struct(
      ceil(w * scale).cast("int").as("out_width"),
      ceil(h * scale).cast("int").as("out_height"))
  }

  /** MPEG-1 LAYER III FRAME HEADER (MP3) — the fifth container grammar
    * (PNG/BMP/GIF fixed-offset, JPEG marker walk, WAV RIFF, MP4 box
    * walk; this is the BIT-FIELD family: four bytes carrying sync,
    * version, layer, and three table-indexed fields). Parses the strict
    * MPEG1-L3-unprotected frame: sync+version+layer byte pair
    * `FF FB`, bitrate index 1–14 (0 = freeform, 15 = invalid) via the
    * published kbps table, sample-rate index 0–2 (3 = reserved), the
    * padding bit, and mono/stereo from the channel-mode bits. Emits the
    * derived frame length `144·bitrate/sample_rate + padding` — the hop
    * distance an MP3 stream walker uses, exact integer division.
    * Malformed/other payloads read well_formed=false with NULL fields
    * (UTF-8 text can never start 0xFF, so the dispatch is crisp).
    * Per-row codegen'd byte arithmetic; the tables are literal arrays,
    * not lookups. */
  def mp3FrameStats(bin: Column): Column = {
    val b2 = byteAt(bin, 2)
    val b3 = byteAt(bin, 3)
    val b4 = byteAt(bin, 4)
    val bri = (b3 / 16).cast("int")
    val sri = ((b3 / 4) % 4).cast("int")
    val pad = ((b3 / 2) % 2).cast("int")
    val valid = octet_length(bin) >= 4 &&
      byteAt(bin, 1) === 255L && b2 === 251L &&
      bri >= 1 && bri <= 14 && sri <= 2
    val br = element_at(typedlit(Seq(32, 40, 48, 56, 64, 80, 96, 112,
      128, 160, 192, 224, 256, 320)), bri)
    val sr = element_at(typedlit(Seq(44100, 48000, 32000)), sri + 1)
    val ch = when((b4 / 64) === 3L, 1).otherwise(2).cast("int")
    when(valid, struct(
      lit(true).as("well_formed"),
      br.as("bitrate_kbps"),
      sr.as("sample_rate"),
      ch.as("channels"),
      pad.as("padding"),
      // exact: integer-valued quotients of <2^26 ints are IEEE-exact,
      // and non-integer ones sit ≥ 1/sr from any integer — floor of
      // the double equals the integer division on both engines
      floor(lit(144.0) * br * 1000 / sr).cast("long")
        .as("frame_bytes_raw")))
      .otherwise(struct(
        lit(false).as("well_formed"),
        lit(null).cast("int").as("bitrate_kbps"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("int").as("channels"),
        lit(null).cast("int").as("padding"),
        lit(null).cast("long").as("frame_bytes_raw")))
  }

  /** FLAC STREAMINFO — the sixth container grammar and the deepest
    * bit-field packing in the family: after the 4-byte `fLaC` magic
    * and the 4-byte metadata-block header (last-flag bit + 7-bit
    * type, u24be length — STREAMINFO is type 0, length 34), the
    * rate/layout fields pack 20+3+5+36 bits into EXACTLY eight bytes:
    * sample rate (20 bits), channels−1 (3), bits-per-sample−1 (5),
    * and total samples (36, straddling byte 22's nibble boundary).
    * Decoded with div/mod byte arithmetic only — the (x/k).cast
    * truncation is exact because the fractional tail stays below the
    * next modulus. `seconds` = total_samples DIV sample_rate via the
    * exact (ts − ts%sr)/sr form: the subtraction makes the double
    * division exact (the quotient is integral and < 2^53). Payloads
    * failing the magic / block-type / length / 42-byte floor read
    * well_formed=false with NULL fields (the corpus text is
    * lowercase, so the case-sensitive `fLaC` magic can never
    * collide). Per-row codegen'd byte arithmetic, one scan. */
  def flacStreamInfo(bin: Column): Column = {
    val b5 = byteAt(bin, 5)
    val len24 = byteAt(bin, 6) * 65536L + byteAt(bin, 7) * 256L +
      byteAt(bin, 8)
    val valid = octet_length(bin) >= 42 &&
      substring(bin, 1, 4).cast("string") === "fLaC" &&
      (b5 % 128) === 0L && len24 === 34L
    val b21 = byteAt(bin, 21)
    val b22 = byteAt(bin, 22)
    val sr = (byteAt(bin, 19) * 256L + byteAt(bin, 20)) * 16L +
      (b21 / 16).cast("long")
    val ts = (b22 % 16) * 4294967296L + beU32(bin, 23)
    when(valid, struct(
      lit(true).as("well_formed"),
      (b5 / 128).cast("int").as("last_block"),
      (byteAt(bin, 9) * 256L + byteAt(bin, 10)).cast("int")
        .as("min_block"),
      (byteAt(bin, 11) * 256L + byteAt(bin, 12)).cast("int")
        .as("max_block"),
      sr.cast("int").as("sample_rate"),
      ((b21 / 2).cast("long") % 8L + 1L).cast("int").as("channels"),
      ((b21 % 2) * 16L + (b22 / 16).cast("long") + 1L).cast("int")
        .as("bits_per_sample"),
      ts.as("total_samples"),
      ((ts - ts % sr) / sr).cast("long").as("seconds")))
      .otherwise(struct(
        lit(false).as("well_formed"),
        lit(null).cast("int").as("last_block"),
        lit(null).cast("int").as("min_block"),
        lit(null).cast("int").as("max_block"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("int").as("channels"),
        lit(null).cast("int").as("bits_per_sample"),
        lit(null).cast("long").as("total_samples"),
        lit(null).cast("long").as("seconds")))
  }

  /** TIFF BASELINE HEADER + IFD SCAN — the seventh container grammar
    * and the first with an ENDIANNESS DISPATCH: the two-byte order
    * mark (`II` little / `MM` big) selects how EVERY subsequent
    * integer reads, so the same field layout parses through two byte
    * orders chosen per row at runtime. After the mark: u16 magic 42,
    * u32 offset to the first IFD (0-based from file start), then the
    * IFD: u16 entry count and 12-byte entries
    * [tag:u16][type:u16][count:u32][value:4B] — a value of type SHORT
    * (3) sits left-justified in the first two value bytes REGARDLESS
    * of endianness (the TIFF spec's one asymmetry), LONG (4) fills
    * all four. The scan walks a bounded entry budget collecting
    * ImageWidth (256) and ImageLength (257), skipping unknown tags —
    * width is constructed as SHORT and height as LONG so both inline
    * encodings sit under the gate. Malformed payloads (no byte-order
    * mark, wrong magic, entry table overrunning the payload, missing
    * dimension tags) read well_formed=false with NULL fields. Pure
    * per-row byte arithmetic, one scan, no shuffle. */
  def tiffMeta(bin: Column, maxEntries: Int = 8): Column = {
    val olen = octet_length(bin).cast("long")
    def bD(off: Column) =
      conv(hex(substring(bin, off.cast("int"), lit(1))), 16, 10)
        .cast("long")
    val le = substring(bin, 1, 2).cast("string") === "II"
    val isBe = substring(bin, 1, 2).cast("string") === "MM"
    // Branch on the byte order ONCE, at the top: a per-read
    // when(le,...) would duplicate both orders inside every integer of
    // every IFD entry (a multi-MiB expression tree); two flat parses
    // selected by one condition stay codegen-friendly.
    def parse(little: Boolean): Column = {
      def u16(off: Column) =
        if (little) bD(off) + bD(off + 1) * 256L
        else bD(off) * 256L + bD(off + 1)
      def u32(off: Column) =
        if (little)
          bD(off) + bD(off + 1) * 256L + bD(off + 2) * 65536L +
            bD(off + 3) * 16777216L
        else bD(off) * 16777216L + bD(off + 1) * 65536L +
          bD(off + 2) * 256L + bD(off + 3)
      // singleton-array transform = a LET BINDING inside one Column:
      // ifd, n, and the decoded entry array each evaluate ONCE instead
      // of inlining their byte-read chains at every use site (the
      // naive inlining codegens a multi-MiB task binary)
      def bind(v: Column)(body: Column => Column): Column =
        try_element_at(transform(array(v), body), lit(1))
      val magic42 = u16(lit(3L)) === 42L
      bind(u32(lit(5L)) + 1L) { ifd => // 0-based offset -> 1-based pos
        bind(u16(ifd)) { n =>
          val entries =
            transform(sequence(lit(0), lit(maxEntries - 1)), i => {
              val e = ifd + lit(2L) + i.cast("long") * 12L
              val typ = u16(e + 2L)
              val v = when(typ === 3L, u16(e + 8L))
                .when(typ === 4L, u32(e + 8L))
                .otherwise(lit(null).cast("long"))
              struct(
                when(i.cast("long") < n, u16(e)).otherwise(lit(-1L))
                  .as("tag"),
                v.as("v"))
            })
          bind(entries.cast(
              "array<struct<tag:bigint,v:bigint>>")) { es =>
            def tagVal(t: Long) = try_element_at(
              filter(es, x => x.getField("tag") === t), lit(1))
              .getField("v")
            val width = tagVal(256L)
            val height = tagVal(257L)
            val valid = olen >= 8L && magic42 &&
              n >= 1L && n <= maxEntries &&
              olen >= ifd + 2L + n * 12L + 3L && // + next-IFD ptr
              width.isNotNull && height.isNotNull
            when(valid, struct(
              lit(true).as("well_formed"),
              lit(if (little) "II" else "MM").as("endian"),
              n.cast("int").as("n_entries"),
              width.as("width"),
              height.as("height")))
              .otherwise(badTiff)
          }
        }
      }
    }
    when(le, parse(little = true))
      .when(isBe, parse(little = false))
      .otherwise(badTiff)
  }

  /** [[tiffMeta]]'s malformed arm (shared by both endian branches). */
  private def badTiff: Column = struct(
    lit(false).as("well_formed"),
    lit(null).cast("string").as("endian"),
    lit(null).cast("int").as("n_entries"),
    lit(null).cast("long").as("width"),
    lit(null).cast("long").as("height"))

  /** Big-endian uint32 at a DYNAMIC 1-based offset (ISO-BMFF's integer
    * encoding). */
  private def dynBeU32(bin: Column, off: Column): Column =
    conv(hex(substring(bin, off.cast("int"), lit(4))), 16, 10).cast("long")

  /** ISO-BMFF (MP4/MOV) TOP-LEVEL BOX WALK — the video-container side of
    * the header-parser family (PNG/BMP fixed-offset, JPEG marker walk,
    * WAV RIFF; this is the fourth real container grammar): every
    * top-level box is `[size:u32be][type:4cc][payload…]`, `off += size`
    * hops the stream, and a well-formed file ends exactly at the last
    * byte. The walk is an `aggregate` HOF over a fixed hop budget with
    * struct state (off, n_boxes, moov flag, mdat payload bytes):
    * off 0 = clean end-of-stream, −1 = malformed (size below the header
    * length or a box overrunning the payload) — the same frozen-terminal
    * discipline as the JPEG [[sofScan]]. The spec's special size
    * encodings are honored: size 0 extends to end-of-file (final box),
    * size 1 reads the 64-bit largesize after the type (16-byte header,
    * mandatory for >4 GB mdat). A clean end needs maxHops ≥ boxes + 1;
    * the default 64 covers fragmented files (moof/mdat trains), and a
    * walk that runs out of hops mid-stream leaves off > 0 — callers
    * treating off === 0 as well-formed must size the budget. `moov` presence is the "is this playable
    * metadata or a bare fragment" probe; mdat bytes are the media
    * payload accounting a video-ingest manifest wants. Pure codegen'd
    * byte arithmetic, one scan, no shuffle. */
  def mp4BoxStats(bin: Column, maxHops: Int = 64): Column = {
    val olen = octet_length(bin).cast("long")
    def st(off: Column, n: Column, moov: Column, mdat: Column) =
      struct(off.as("off"), n.as("n"), moov.as("moov"), mdat.as("mdat"))
    aggregate(
      sequence(lit(1), lit(maxHops)),
      st(lit(1L), lit(0L), lit(0L), lit(0L)),
      (acc, _) => {
        val off = acc.getField("off")
        val n = acc.getField("n")
        val moov = acc.getField("moov")
        val mdat = acc.getField("mdat")
        val raw = dynBeU32(bin, off)
        // the spec's two special size encodings are LEGAL, not errors:
        // 0 = box extends to end of file (only valid as the last box),
        // 1 = 64-bit largesize follows the type (16-byte header)
        val hdr = when(raw === 1L, lit(16L)).otherwise(lit(8L))
        val size = when(raw === 0L, olen - off + 1)
          .when(raw === 1L,
            conv(hex(substring(bin, (off + 8).cast("int"), lit(8))),
              16, 10).cast("long"))
          .otherwise(raw)
        val typ = substring(bin, (off + 4).cast("int"), lit(4))
          .cast("string")
        when(off <= 0, acc)                          // settled (end/bad)
          .when(off === olen + 1, st(lit(0L), n, moov, mdat)) // clean end
          // `size > olen` screens an adversarial 64-bit largesize near
          // Long.MaxValue BEFORE the `off + size` sum: without it the
          // sum overflows negative, slips past the overrun check, and
          // freezes the walk at a negative off outside the documented
          // {0, -1, >0} terminal contract. With size ≤ olen (≤ 2 GiB
          // for any binary column) the sum cannot overflow.
          .when(off + 7 > olen || size < hdr || size > olen ||
              off + size > olen + 1,
            st(lit(-1L), n, moov, mdat))             // malformed/truncated
          .otherwise(st(off + size, n + 1,
            greatest(moov, when(typ === "moov", lit(1L)).otherwise(0L)),
            mdat + when(typ === "mdat", size - hdr).otherwise(0L)))
      })
  }

  /** SRT SUBTITLE parsing — the transcript side of video training data
    * (every large video corpus ships cue files; token-level work needs
    * them as (cue, start_ms, end_ms, text) rows). Cues split on blank
    * lines; each parses with ONE regex (index, two HH:MM:SS,mmm
    * timecodes, text) and the timecode decodes with integer arithmetic.
    * Malformed cues drop out via the regex returning empty groups (the
    * filter keeps only rows whose index parsed). Per-row explode +
    * regexp work, one scan. */
  def srtCues(df: DataFrame, payload: Column): DataFrame = {
    // ^-anchored: regexp_extract matches ANYWHERE by default, which
    // would let a malformed block with an embedded cue-shaped tail
    // parse as a cue instead of dropping. Hours are \d{2,} — SRT allows
    // 3+ digit hours on long concatenations, matching [[srtTimecode]].
    val re = "^(\\d+)\\n(\\d{2,}):(\\d{2}):(\\d{2}),(\\d{3}) --> " +
      "(\\d{2,}):(\\d{2}):(\\d{2}),(\\d{3})\\n([\\s\\S]*)"
    def ms(h: Int, m: Int, s: Int, f: Int)(c: Column) =
      regexp_extract(c, re, h).cast("long") * 3600000L +
        regexp_extract(c, re, m).cast("long") * 60000L +
        regexp_extract(c, re, s).cast("long") * 1000L +
        regexp_extract(c, re, f).cast("long")
    df.withColumn("__cue", explode(split(payload, "\n\n")))
      .filter(regexp_extract(col("__cue"), re, 1) =!= "")
      .select(col("doc_id"),
        regexp_extract(col("__cue"), re, 1).cast("long").as("cue_no"),
        ms(2, 3, 4, 5)(col("__cue")).as("start_ms"),
        ms(6, 7, 8, 9)(col("__cue")).as("end_ms"),
        regexp_extract(col("__cue"), re, 10).as("cue_text"))
  }

  /** HH:MM:SS,mmm SRT timecode text from a millisecond column — the
    * construction twin of [[srtCues]]' decode, shared by the mm12 gate
    * so encode and parse cannot desynchronize. */
  private[graft] def srtTimecode(msv: Column): Column = {
    // lpad TRUNCATES strings longer than len — hours must widen past
    // 99 (long transcript concatenations), not silently wrap
    val hh = floor(msv / 3600000L).cast("long").cast("string")
    concat(
    when(length(hh) < 2, lpad(hh, 2, "0")).otherwise(hh),
    lit(":"),
    lpad((floor(msv / 60000L) % 60).cast("long").cast("string"), 2, "0"),
    lit(":"),
    lpad((floor(msv / 1000L) % 60).cast("long").cast("string"), 2, "0"),
    lit(","),
    lpad((msv % 1000).cast("string"), 3, "0"))
  }

  /** Frame sampling for "video" payloads: fixed-stride byte windows stand
    * in for decoded frames, exploded to per-frame rows (frame_no,
    * frame_hash) — the explode/re-aggregate shape a real frame pipeline
    * has. */
  def frameRows(df: DataFrame, bin: Column, nFrames: Int,
      frameBytes: Int): DataFrame =
    df.withColumn("f",
        explode(transform(sequence(lit(0), lit(nFrames - 1)), i => i)))
      .withColumn("frame_bytes",
        expr(s"substring(payload, f * $frameBytes + 1, $frameBytes)"))
      .withColumn("frame_hash", xxhash64(col("frame_bytes")))
      .drop("frame_bytes")

  /** WebP CONTAINER METADATA — the fifth real container grammar
    * (PNG/BMP fixed-offset, JPEG marker walk, WAV/RIFF, ISO-BMFF box
    * walk; WebP is RIFF with THREE mutually-exclusive payload
    * grammars, so the parse is a fourcc dispatch). Layout (1-based
    * byte offsets): `RIFF` 1-4, riff size LE32 5-8, `WEBP` 9-12,
    * chunk fourcc 13-16, chunk size LE32 17-20, payload from 21.
    *
    *  - `VP8 ` (lossy): 3-byte frame tag 21-23, sync `9D 01 2A`
    *    24-26, then width/height as LE16 fields at 27/29 with the low
    *    14 bits the dimension (top 2 bits are the upscale hint).
    *  - `VP8L` (lossless): signature byte 0x2F at 21, then ONE LE32
    *    bitfield at 22-25: bits 0-13 = width−1, 14-27 = height−1,
    *    bit 28 = alpha-is-used.
    *  - `VP8X` (extended): feature flags at 21 (bit 4 = alpha), 3
    *    reserved bytes, then canvas width−1 / height−1 as LE24 at
    *    25/28.
    *
    * Anything failing the RIFF/WEBP magic or its variant's signature
    * reads well_formed=false with NULL fields — same frozen-terminal
    * discipline as [[mp3FrameStats]]. Pure codegen'd byte arithmetic
    * per row; no UDF, no codec library. */
  def webpMeta(bin: Column): Column = {
    val hx = hex(bin)
    val riffOk = octet_length(bin) >= 21 &&
      substring(hx, 1, 8) === "52494646" &&
      substring(hx, 17, 8) === "57454250"
    val fourcc = substring(hx, 25, 8)
    def leU24(off: Int): Column =
      byteAt(bin, off) + byteAt(bin, off + 1) * 256L +
        byteAt(bin, off + 2) * 65536L
    val vp8Ok = octet_length(bin) >= 30 && fourcc === "56503820" &&
      substring(hx, 47, 6) === "9D012A"
    val vp8lOk = octet_length(bin) >= 25 && fourcc === "5650384C" &&
      byteAt(bin, 21) === 47L
    val vp8xOk = octet_length(bin) >= 30 && fourcc === "56503858"
    val lbits = leU32(bin, 22)
    def out(variant: String, w: Column, h: Column, a: Column): Column =
      struct(lit(true).as("well_formed"), lit(variant).as("variant"),
        w.cast("long").as("width"), h.cast("long").as("height"),
        a.cast("int").as("has_alpha"))
    when(riffOk && vp8Ok, out("vp8",
        leU16(bin, 27).bitwiseAND(lit(16383L)),
        leU16(bin, 29).bitwiseAND(lit(16383L)), lit(0)))
      .when(riffOk && vp8lOk, out("vp8l",
        lbits.bitwiseAND(lit(16383L)) + 1L,
        call_function("shiftright", lbits, lit(14))
          .bitwiseAND(lit(16383L)) + 1L,
        call_function("shiftright", lbits, lit(28)).bitwiseAND(lit(1L))))
      .when(riffOk && vp8xOk, out("vp8x", leU24(25) + 1L, leU24(28) + 1L,
        when(byteAt(bin, 21).bitwiseAND(lit(16L)) =!= 0L, 1).otherwise(0)))
      .otherwise(struct(lit(false).as("well_formed"),
        lit(null).cast("string").as("variant"),
        lit(null).cast("long").as("width"),
        lit(null).cast("long").as("height"),
        lit(null).cast("int").as("has_alpha")))
  }

  /** Hex text of a minimal WebP payload for each variant — the
    * construction twin of [[webpMeta]], shared by the mm15 gate and
    * MultimodalSpec so encode and parse can never drift. `variant`:
    * 0 = VP8 lossy, 1 = VP8L lossless, 2 = VP8X extended. */
  private[graft] def webpHex(
      variant: Int, w: Column, h: Column, alpha: Column): Column = {
    val pre = concat(lit("52494646"),
      le32hexCol(lit(if (variant == 1) 17 else 22)), lit("57454250"))
    variant match {
      case 0 => concat(pre, lit("56503820"), le32hexCol(lit(10)),
        lit("000000"), lit("9D012A"), le16hexCol(w), le16hexCol(h))
      case 1 => concat(pre, lit("5650384C"), le32hexCol(lit(5)),
        lit("2F"), le32hexCol(
          w - 1 + (h - 1) * 16384L + alpha * 268435456L))
      case _ => concat(pre, lit("56503858"), le32hexCol(lit(10)),
        when(alpha === 1, lit("10")).otherwise(lit("00")), lit("000000"),
        le24hexCol(w - 1), le24hexCol(h - 1))
    }
  }
}

/** Driver-facing multimodal queries over `documents` (as the binary
  * carrier). mm01 is DuckDB-oracle-checked (byte size + magic bytes are
  * engine-independent); the stubbed-decode queries are rows-only checks
  * with determinism asserted in MultimodalSpec. */
object MultimodalQueries {
  import Multimodal._

  /** The mm02/mm03 shared mixed-corpus payload: doc_id%3==0 rows carry a
    * constructed PNG (dims + color type derived from doc_id — the oracle
    * states this arithmetic), the rest the raw text bytes (md5-stub
    * fallback arm). One definition so the two entries and their oracles
    * can never drift apart. */
  private def mixedImagePayload: org.apache.spark.sql.Column = {
    val w = (col("doc_id") % 300 + 10).cast("int")
    val h = ((col("doc_id") * 5) % 200 + 10).cast("int")
    val ct = when(col("doc_id") % 2 === 0, lit("00")).otherwise(lit("06"))
    when(col("doc_id") % 3 === 0, unhex(pngHex(w, h, ct)))
      .otherwise(payload(col("text")))
  }

  val queries: Seq[Q] = Seq(

    Q("mm01_binary_meta",
      (s, d) => {
        val bin = payload(col("text"))
        Tables.t(s, d, "documents").select(
          col("doc_id"),
          byteSize(bin).as("n_bytes"),
          magic(bin).as("magic"))
      },
      Some("""SELECT doc_id,
             |CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |left(hex(encode(text)), 8) AS magic
             |FROM documents""".stripMargin.replace('\n', ' ')),
      bench = true),

    // mm02/mm03 run the REAL magic-dispatched decodeHeader over a MIXED
    // corpus — doc_id%3==0 rows carry a constructed PNG payload
    // (doc_id-derived dims, mm06-09's construction), the rest carry the
    // raw text bytes and land on the md5-derived fakeDecode fallback.
    // Since BOTH arms are now oracle-stateable (the stub swapped its
    // xxhash64 basis for t05b's md5-slice arithmetic), the per-row
    // FORMAT DISPATCH itself sits under the driver's hash gate — the
    // entry matches only if every row takes the arm its magic bytes
    // dictate — which the all-constructed mm06-09 gates can't test.
    // The parse arms stay spec-verified on hand-built byte literals too.
    Q("mm02_image_meta",
      (s, d) => {
        Tables.t(s, d, "documents")
          .select(col("doc_id"), decodeHeader(mixedImagePayload).as("meta"))
          .select(
            col("doc_id"),
            col("meta.width").as("width"),
            col("meta.height").as("height"),
            col("meta.channels").as("channels"),
            (col("meta.width").cast("long") * col("meta.height") *
              col("meta.channels")).as("n_pixels"))
      },
      Some("""WITH m AS (SELECT doc_id,
             |CASE WHEN doc_id % 3 = 0
             |THEN CAST(doc_id % 300 + 10 AS INTEGER)
             |ELSE CAST(CAST(('0x' || substr(md5(text),1,15)) AS BIGINT)
             |% 608 + 32 AS INTEGER) END AS width,
             |CASE WHEN doc_id % 3 = 0
             |THEN CAST((doc_id * 5) % 200 + 10 AS INTEGER)
             |ELSE CAST(CAST(('0x' || substr(md5(text),16,15)) AS BIGINT)
             |% 608 + 32 AS INTEGER) END AS height,
             |CASE WHEN doc_id % 3 = 0
             |THEN CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 4 END
             |AS INTEGER)
             |ELSE CAST(3 AS INTEGER) END AS channels
             |FROM documents)
             |SELECT doc_id, width, height, channels,
             |CAST(width AS BIGINT) * height * channels AS n_pixels
             |FROM m""".stripMargin.replace('\n', ' '))),

    // Resize planning over the SAME mixed corpus: target dims from the
    // identical IEEE expression on both engines (mm09's construction),
    // composed on top of mm02's two-arm metadata — so the gate covers
    // dispatch → parse/stub → resize arithmetic as one plan.
    Q("mm03_resize_plan",
      (s, d) => {
        Tables.t(s, d, "documents")
          .select(col("doc_id"), decodeHeader(mixedImagePayload).as("meta"))
          .select(col("doc_id"),
            resizePlan(col("meta"), maxDim = 256).as("r"))
          .select(col("doc_id"), col("r.out_width").as("out_width"),
            col("r.out_height").as("out_height"))
      },
      Some("""WITH dims AS (SELECT doc_id,
             |CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id % 300 + 10
             |ELSE CAST(('0x' || substr(md5(text),1,15)) AS BIGINT)
             |% 608 + 32 END AS DOUBLE) AS w,
             |CAST(CASE WHEN doc_id % 3 = 0 THEN (doc_id * 5) % 200 + 10
             |ELSE CAST(('0x' || substr(md5(text),16,15)) AS BIGINT)
             |% 608 + 32 END AS DOUBLE) AS h FROM documents),
             |sc AS (SELECT doc_id, w, h,
             |least(256.0 / greatest(w, h), 1.0) AS scale FROM dims)
             |SELECT doc_id,
             |CAST(ceil(w * scale) AS INTEGER) AS out_width,
             |CAST(ceil(h * scale) AS INTEGER) AS out_height FROM sc"""
        .stripMargin.replace('\n', ' '))),

    // The xxhash64 frame hashes stay INSIDE the query (only the distinct
    // COUNT is emitted, per doc over ≤4 frames), so the oracle counts
    // distinct raw byte windows instead of hashes — DuckDB cannot
    // substring a BLOB, but this corpus is pure ASCII (verified at
    // sf0.001/0.01/0.1), so its char-based substring slices the same
    // bytes as Spark's binary substring.
    Q("mm04_frame_hashes",
      (s, d) => {
        val withPayload = Tables.t(s, d, "documents")
          .select(col("doc_id"), payload(col("text")).as("payload"))
        frameRows(withPayload, col("payload"), nFrames = 4, frameBytes = 32)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_frames"),
            countDistinct(col("frame_hash")).as("n_distinct_frames"))
      },
      Some("""SELECT doc_id, count(*) AS n_frames,
             |count(DISTINCT substring(text, CAST(f AS INTEGER) * 32 + 1, 32))
             |AS n_distinct_frames
             |FROM documents, range(4) t(f) GROUP BY doc_id"""
        .stripMargin.replace('\n', ' '))),

    // mm05: audio metadata + playback-duration accounting over the mixed
    // corpus (mm02's two-arm design for audio): doc_id%3==0 rows carry a
    // constructed canonical PCM WAV header (doc_id-derived rate/channels/
    // payload size), the rest land on the md5-derived fakeAudioDecode
    // fallback — both arms oracle-stated, so the WAV magic dispatch and
    // the duration arithmetic sit under the hash gate. est_seconds is
    // the identical IEEE expression on both engines, floored at 1e-4
    // (see audioSeconds: round(double,4) is cross-engine tie-unsafe).
    Q("mm05_audio_meta",
      (s, d) => {
        val rate = when(col("doc_id") % 9 === 0, lit(8000))
          .when(col("doc_id") % 9 === 3, lit(16000)).otherwise(lit(44100))
        val ch = (col("doc_id") % 2 + 1).cast("int")
        val db = (col("doc_id") % 777 + 64).cast("int")
        val bin = when(col("doc_id") % 3 === 0, unhex(wavHex(rate, ch, db)))
          .otherwise(payload(col("text")))
        Tables.t(s, d, "documents")
          .select(col("doc_id"), decodeAudioHeader(bin).as("meta"))
          .select(col("doc_id"),
            col("meta.sample_rate").as("sample_rate"),
            col("meta.channels").as("channels"),
            col("meta.bits").as("bits"),
            audioSeconds(col("meta")).as("est_seconds"))
      },
      Some("""WITH m AS (SELECT doc_id,
             |CASE WHEN doc_id % 3 = 0
             |THEN (CASE doc_id % 9 WHEN 0 THEN 8000 WHEN 3 THEN 16000
             |ELSE 44100 END)
             |ELSE (CASE CAST(('0x' || substr(md5(text),1,15)) AS BIGINT)
             |% 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END)
             |END AS sample_rate,
             |CASE WHEN doc_id % 3 = 0 THEN doc_id % 2 + 1
             |ELSE CAST(('0x' || substr(md5(text),16,15)) AS BIGINT) % 2 + 1
             |END AS channels,
             |CASE WHEN doc_id % 3 = 0 THEN doc_id % 777 + 64
             |ELSE octet_length(encode(text)) END AS data_bytes
             |FROM documents)
             |SELECT doc_id,
             |CAST(sample_rate AS INTEGER) AS sample_rate,
             |CAST(channels AS INTEGER) AS channels,
             |CAST(16 AS INTEGER) AS bits,
             |floor(CAST(data_bytes AS DOUBLE) * 10000.0 /
             |(CAST(sample_rate AS DOUBLE) * channels * 2)) / 10000.0
             |AS est_seconds FROM m"""
        .stripMargin.replace('\n', ' '))),

    // JPEG ROUND TRIP — the driver-visible gate for the SOF segment walk
    // (the byte-literal specs prove the parse on hand-built frames; this
    // proves it under the DuckDB hash gate): per document, CONSTRUCT a
    // real JPEG prefix (SOI + JFIF APP0 + SOF0/grayscale-or-YCbCr frame)
    // whose dims derive deterministically from doc_id, then parse it
    // back with the production [[decodeHeader]]. The oracle never
    // parses — it states the same dim arithmetic directly, so the entry
    // hash-matches iff the segment walk recovers exactly the dims that
    // were encoded. Construction is hex-text concat → unhex (all
    // codegen'd built-ins), per-row work in one scan.
    Q("mm06_jpeg_roundtrip",
      (s, d) => {
        val w = (col("doc_id") % 2000 + 16).cast("int")
        val h = ((col("doc_id") * 7) % 1200 + 16).cast("int")
        val nc = when(col("doc_id") % 3 === 0, lit(1)).otherwise(lit(3))
        val hexStr = concat(
          lit("FFD8"),                                   // SOI
          lit("FFE000104A46494600010100000100010000"),   // APP0 (JFIF)
          lit("FFC0"),                                   // SOF0
          lpad(hex(lit(8) + nc * 3), 4, "0"),            // frame length
          lit("08"),                                     // precision
          lpad(hex(h), 4, "0"), lpad(hex(w), 4, "0"),    // BE dims
          lpad(hex(nc), 2, "0"),                         // n components
          when(nc === 1, lit("011100"))                  // component specs
            .otherwise(lit("012200021101031101")))
        Tables.t(s, d, "documents")
          .select(col("doc_id"),
            decodeHeader(unhex(hexStr)).as("m"))
          .select(col("doc_id"),
            col("m.width").as("width"),
            col("m.height").as("height"),
            col("m.channels").as("channels"))
      },
      Some("""SELECT doc_id,
             |CAST(doc_id % 2000 + 16 AS INTEGER) AS width,
             |CAST((doc_id * 7) % 1200 + 16 AS INTEGER) AS height,
             |CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 3 END AS INTEGER)
             |AS channels FROM documents"""
        .stripMargin.replace('\n', ' '))),

    // PNG/BMP ROUND TRIP — mm06's construction applied to the other two
    // image parsers AND the magic dispatch itself: even doc_ids build a
    // PNG IHDR prefix, odd ones a BMP DIB prefix, with dims and the
    // channel selector derived from doc_id; the oracle states the
    // arithmetic, so the entry hash-matches only if BOTH parsers AND
    // the format dispatch recover every encoded field.
    Q("mm07_image_roundtrip",
      (s, d) => {
        val w = (col("doc_id") % 500 + 8).cast("int")
        val h = ((col("doc_id") * 3) % 400 + 8).cast("int")
        val sel = col("doc_id") % 3 // 0/1/2 → 1/3/4 channels, both formats
        val pngCt = when(sel === 0, lit("00")).when(sel === 1, lit("02"))
          .otherwise(lit("06"))
        val bmpBpp = when(sel === 0, lit("0800"))
          .when(sel === 1, lit("1800")).otherwise(lit("2000")) // LE u16
        val png = pngHex(w, h, pngCt)
        val bmp = concat(
          lit("424D"), le32hexCol(lit(123)), lit("00000000"),
          le32hexCol(lit(54)), le32hexCol(lit(40)),
          le32hexCol(w), le32hexCol(h), lit("0100"), bmpBpp)
        val hexS = when(col("doc_id") % 2 === 0, png).otherwise(bmp)
        Tables.t(s, d, "documents")
          .select(col("doc_id"), decodeHeader(unhex(hexS)).as("m"))
          .select(col("doc_id"),
            col("m.width").as("width"), col("m.height").as("height"),
            col("m.channels").as("channels"))
      },
      Some("""SELECT doc_id,
             |CAST(doc_id % 500 + 8 AS INTEGER) AS width,
             |CAST((doc_id * 3) % 400 + 8 AS INTEGER) AS height,
             |CAST(CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END
             |AS INTEGER) AS channels FROM documents"""
        .stripMargin.replace('\n', ' '))),

    // WAV ROUND TRIP — the audio parser under the same gate: canonical
    // PCM headers with doc_id-derived rate/channels/payload size, parsed
    // back by the production decodeAudioHeader.
    Q("mm08_audio_roundtrip",
      (s, d) => {
        val rate = element_at(
          typedlit(Seq(8000, 16000, 44100)),
          (col("doc_id") % 3 + 1).cast("int"))
        val ch = (col("doc_id") % 2 + 1).cast("int")
        val db = (col("doc_id") % 1000 + 100).cast("int")
        val hexS = wavHex(rate, ch, db)
        Tables.t(s, d, "documents")
          .select(col("doc_id"), decodeAudioHeader(unhex(hexS)).as("m"))
          .select(col("doc_id"),
            col("m.sample_rate").as("sample_rate"),
            col("m.channels").as("channels"),
            col("m.bits").as("bits"),
            col("m.data_bytes").as("data_bytes"))
      },
      Some("""SELECT doc_id,
             |CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
             |ELSE 44100 END AS INTEGER) AS sample_rate,
             |CAST(doc_id % 2 + 1 AS INTEGER) AS channels,
             |CAST(16 AS INTEGER) AS bits,
             |CAST(doc_id % 1000 + 100 AS BIGINT) AS data_bytes
             |FROM documents"""
        .stripMargin.replace('\n', ' '))),

    // RESIZE-PLAN ROUND TRIP — mm03's operator (fit-inside-maxDim target
    // dims) under the hash gate, fed by mm07's constructed PNG arm so
    // the input dims are oracle-stateable: both engines evaluate the
    // IDENTICAL IEEE expression (least(maxDim/greatest(w,h), 1) scale,
    // ceil of the product), so the plan is bit-identical cross-engine.
    Q("mm09_resize_roundtrip",
      (s, d) => {
        val w = (col("doc_id") % 500 + 8).cast("int")
        val h = ((col("doc_id") * 3) % 400 + 8).cast("int")
        val png = pngHex(w, h, lit("02"))
        Tables.t(s, d, "documents")
          .select(col("doc_id"),
            resizePlan(decodeHeader(unhex(png)), maxDim = 64).as("r"))
          .select(col("doc_id"),
            col("r.out_width").as("out_width"),
            col("r.out_height").as("out_height"))
      },
      Some("""WITH dims AS (SELECT doc_id,
             |CAST(doc_id % 500 + 8 AS DOUBLE) AS w,
             |CAST((doc_id * 3) % 400 + 8 AS DOUBLE) AS h FROM documents),
             |sc AS (SELECT doc_id, w, h,
             |least(64.0 / greatest(w, h), 1.0) AS scale FROM dims)
             |SELECT doc_id,
             |CAST(ceil(w * scale) AS INTEGER) AS out_width,
             |CAST(ceil(h * scale) AS INTEGER) AS out_height FROM sc"""
        .stripMargin.replace('\n', ' ')))
  ,

    // KEYFRAME SAMPLING under the hash gate — the frame-sample step of a
    // video curation pipeline: explode each "video" into frames, compute
    // a per-frame content signature, and KEEP a frame iff it opens a new
    // scene (its signature differs from the previous frame's — temporal
    // change detection via lag, the shape real keyframe extraction
    // uses after decode). The decode is the documented stub (this
    // container has no codecs): frame signatures are CONSTRUCTED as
    // md5(doc-content-hash : scene), with doc_id-varied scene lengths
    // (1/2/3 frames) so run boundaries land differently per doc and the
    // lag comparison is exercised at every offset — both engines state
    // the same string arithmetic, so selection is under the driver gate.
    // Scale: one explode (frames × docs), ONE bounded per-video window
    // (frames-per-video rows of state, never corpus-wide) — swap the
    // constructed signature for a real decoded-frame hash (mm04's
    // substring+hash path) and the plan is unchanged.
    Q("mm10_keyframe_sample",
      (s, d) => {
        val nFrames = 12
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("frame_no")
        val scene = floor(col("frame_no") / (lit(1) + col("doc_id") % 3))
        Tables.t(s, d, "documents")
          .select(col("doc_id"), md5(col("text")).as("th"),
            explode(sequence(lit(0), lit(nFrames - 1))).as("fi"))
          .select(col("doc_id"), col("th"),
            col("fi").cast("long").as("frame_no"))
          .withColumn("frame_h",
            md5(concat_ws(":", col("th"), scene.cast("string"))))
          .withColumn("ph", lag(col("frame_h"), 1).over(w))
          .filter(col("ph").isNull || col("frame_h") =!= col("ph"))
          .select(col("doc_id"), col("frame_no"), col("frame_h"))
      },
      Some("""WITH f AS (SELECT doc_id, md5(text) AS th,
             |unnest(range(0, 12)) AS frame_no FROM documents),
             |h AS (SELECT doc_id, frame_no,
             |md5(th || ':' ||
             |CAST(frame_no // (1 + doc_id % 3) AS VARCHAR)) AS frame_h
             |FROM f),
             |k AS (SELECT doc_id, frame_no, frame_h,
             |lag(frame_h) OVER (PARTITION BY doc_id ORDER BY frame_no)
             |AS ph FROM h)
             |SELECT doc_id, frame_no, frame_h FROM k
             |WHERE ph IS NULL OR frame_h <> ph"""
        .stripMargin.replace('\n', ' '))),

    // MP4 BOX WALK under the hash gate — mm06's constructed-payload
    // pattern applied to the video CONTAINER grammar: each doc builds
    // ftyp + free (doc_id-sized) + [moov on even ids] + mdat
    // (doc_id-sized) with real box headers and zero payloads, and
    // [[Multimodal.mp4BoxStats]]' hop walk must recover box count, moov
    // presence, and mdat byte accounting exactly as the oracle states
    // the arithmetic. A clean walk ends with off=0 (asserted via the
    // gated `well_formed` column), so a size-arithmetic bug anywhere in
    // the walk flips the gate red.
    Q("mm11_mp4_boxes",
      (s, d) => {
        val f = (col("doc_id") % 120 + 8).cast("int")
        val m = ((col("doc_id") * 3) % 200 + 8).cast("int")
        val hexStr = concat(
          lit("00000010"), lit("66747970"),             // ftyp, size 16
          lit("69736F6D"), lit("00000000"),             // brand + minor
          lpad(hex(f), 8, "0"), lit("66726565"),        // free, sized
          call_function("repeat", lit("00"), (f - 8).cast("int")),
          when(col("doc_id") % 2 === 0,
            lit("000000086D6F6F76")).otherwise(lit("")), // moov, size 8
          lpad(hex(m), 8, "0"), lit("6D646174"),        // mdat, sized
          call_function("repeat", lit("00"), (m - 8).cast("int")))
        Tables.t(s, d, "documents")
          .select(col("doc_id"),
            mp4BoxStats(unhex(hexStr)).as("b"))
          .select(col("doc_id"),
            col("b.n").as("n_boxes"),
            (col("b.moov") === 1).as("has_moov"),
            col("b.mdat").as("mdat_bytes"),
            (col("b.off") === 0).as("well_formed"))
      },
      Some("""SELECT doc_id,
             |CAST(CASE WHEN doc_id % 2 = 0 THEN 4 ELSE 3 END AS BIGINT)
             |AS n_boxes,
             |doc_id % 2 = 0 AS has_moov,
             |CAST((doc_id * 3) % 200 AS BIGINT) AS mdat_bytes,
             |true AS well_formed FROM documents"""
        .stripMargin.replace('\n', ' '))),

    // SRT SUBTITLE ROUND TRIP under the hash gate — mm06's pattern on
    // the transcript container: each doc constructs doc_id%4+1 cues
    // with doc_id-derived timecodes via [[Multimodal.srtTimecode]],
    // and [[Multimodal.srtCues]]' blank-line split + regex + timecode
    // decode must recover cue count, total subtitle duration, and the
    // last end time exactly as the oracle states the arithmetic.
    Q("mm12_srt_cues",
      (s, d) => {
        val k = (col("doc_id") % 4 + 1).cast("int")
        val cues = transform(sequence(lit(1), k), i => {
          val st = i.cast("long") * 2000L + pmod(col("doc_id"), lit(1000L))
          concat(i.cast("string"), lit("\n"),
            srtTimecode(st), lit(" --> "), srtTimecode(st + 1500L),
            lit("\n"),
            concat(lit("cue "), i.cast("string"), lit(" of doc "),
              col("doc_id").cast("string")))
        })
        val docs = Tables.t(s, d, "documents")
          .withColumn("__srt", array_join(cues, "\n\n"))
        srtCues(docs, col("__srt"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_cues"),
            sum(col("end_ms") - col("start_ms")).as("total_ms"),
            max(col("end_ms")).as("last_end_ms"))
      },
      Some("""SELECT doc_id,
             |CAST(doc_id % 4 + 1 AS BIGINT) AS n_cues,
             |CAST(1500 * (doc_id % 4 + 1) AS BIGINT) AS total_ms,
             |CAST((doc_id % 4 + 1) * 2000 + doc_id % 1000 + 1500
             |AS BIGINT) AS last_end_ms FROM documents"""
        .stripMargin.replace('\n', ' '))),

    // GIF ROUND TRIP — the fourth image format in [[decodeHeader]]'s
    // magic dispatch (meme/reaction corpora are GIF-heavy; a crawl
    // image pipeline that can't cost GIFs mis-budgets them): construct
    // GIF87a/GIF89a logical-screen descriptors with doc_id-derived LE
    // u16 dims (alternating per parity, so BOTH version magics fire
    // under the gate), parse the dims back through the production
    // dispatch, and read the 3-char version straight from the bytes —
    // the entry matches iff the encode arithmetic, the magic routing,
    // and the little-endian field decode all agree with the oracle's
    // restatement. Per-row codegen'd byte work, one scan, no shuffle.
    Q("mm13_gif_roundtrip",
      (s, d) => {
        val w = (col("doc_id") % 600 + 1).cast("int")
        val h = ((col("doc_id") * 7) % 400 + 1).cast("int")
        val ver = when(col("doc_id") % 2 === 0, lit("383761")) // "87a"
          .otherwise(lit("383961"))                            // "89a"
        val hexS = concat(lit("474946"), ver,
          le16hexCol(w), le16hexCol(h), lit("F70000"))
        Tables.t(s, d, "documents")
          .withColumn("__b", unhex(hexS))
          .select(col("doc_id"),
            decodeHeader(col("__b")).as("m"),
            substring(col("__b"), 4, 3).cast("string").as("version"))
          .select(col("doc_id"),
            col("m.width").as("width"), col("m.height").as("height"),
            col("m.channels").as("channels"), col("version"))
      },
      Some("""SELECT doc_id,
             |CAST(doc_id % 600 + 1 AS INTEGER) AS width,
             |CAST((doc_id * 7) % 400 + 1 AS INTEGER) AS height,
             |CAST(3 AS INTEGER) AS channels,
             |CASE WHEN doc_id % 2 = 0 THEN '87a' ELSE '89a' END
             |AS version FROM documents"""
        .stripMargin.replace('\n', ' '))),

    // mm14: MP3 frame-header parse over a MIXED corpus — doc_id%3==0
    // rows carry a constructed MPEG1-L3 header (bitrate index
    // doc_id%14+1, sample-rate index (doc_id DIV 3)%3, padding
    // (doc_id DIV 2)%2, mono doc_id%2 — all four bit-fields sweep
    // their ranges), the rest carry raw text bytes and must land on
    // the well_formed=false NULL arm (UTF-8 never starts 0xFF). The
    // oracle restates the kbps/Hz tables and the frame-length integer
    // division, so the gate holds the BIT-FIELD decode — div/mod
    // arithmetic, two table lookups, channel-mode collapse — and the
    // dispatch itself, per row.
    Q("mm14_mp3_frames",
      (s, d) => {
        val bri = (col("doc_id") % 14 + 1).cast("long")
        val sri = expr("(doc_id DIV 3) % 3").cast("long")
        val pad = expr("(doc_id DIV 2) % 2").cast("long")
        val mono = (col("doc_id") % 2).cast("long")
        val hdr = concat(lit("FFFB"),
          lpad(hex(bri * 16 + sri * 4 + pad * 2), 2, "0"),
          lpad(hex(mono * 192), 2, "0"))
        val bin = when(col("doc_id") % 3 === 0, unhex(hdr))
          .otherwise(payload(col("text")))
        Tables.t(s, d, "documents")
          .select(col("doc_id"), mp3FrameStats(bin).as("m"))
          .select(col("doc_id"), col("m.well_formed").as("well_formed"),
            col("m.bitrate_kbps").as("bitrate_kbps"),
            col("m.sample_rate").as("sample_rate"),
            col("m.channels").as("channels"),
            col("m.padding").as("padding"),
            (col("m.frame_bytes_raw") + col("m.padding"))
              .as("frame_bytes"))
      },
      Some("""WITH m AS (SELECT doc_id,
             |doc_id % 14 + 1 AS bri, (doc_id // 3) % 3 AS sri,
             |(doc_id // 2) % 2 AS pad, doc_id % 2 AS mono
             |FROM documents WHERE doc_id % 3 = 0),
             |v AS (SELECT doc_id,
             |CAST(CASE bri WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48
             |WHEN 4 THEN 56 WHEN 5 THEN 64 WHEN 6 THEN 80 WHEN 7 THEN 96
             |WHEN 8 THEN 112 WHEN 9 THEN 128 WHEN 10 THEN 160
             |WHEN 11 THEN 192 WHEN 12 THEN 224 WHEN 13 THEN 256
             |ELSE 320 END AS INTEGER) AS bitrate_kbps,
             |CAST(CASE sri WHEN 0 THEN 44100 WHEN 1 THEN 48000
             |ELSE 32000 END AS INTEGER) AS sample_rate,
             |CAST(CASE WHEN mono = 1 THEN 1 ELSE 2 END AS INTEGER)
             |AS channels, CAST(pad AS INTEGER) AS padding FROM m)
             |SELECT doc_id, TRUE AS well_formed, bitrate_kbps,
             |sample_rate, channels, padding,
             |CAST(144 * bitrate_kbps * 1000 // sample_rate + padding
             |AS BIGINT) AS frame_bytes FROM v
             |UNION ALL SELECT doc_id, FALSE, NULL, NULL, NULL, NULL,
             |NULL FROM documents WHERE doc_id % 3 <> 0"""
        .stripMargin.replace('\n', ' '))),

    // mm15: WebP metadata under the hash gate — see [[Multimodal
    // .webpMeta]]. The mixed corpus cycles all FOUR arms (VP8 lossy /
    // VP8L lossless / VP8X extended / raw text → malformed), each
    // constructed from doc_id arithmetic via [[Multimodal.webpHex]],
    // so the fourcc dispatch, all three dimension encodings (masked
    // LE16, packed LE32 bitfield, LE24+1), and both alpha flags sit
    // under the driver gate; the oracle states the construction.
    Q("mm15_webp_meta",
      (s, d) => {
        val w = (col("doc_id") % 600 + 16).cast("long")
        val h = ((col("doc_id") * 7) % 400 + 16).cast("long")
        val al = (col("doc_id") % 2).cast("long")
        val bin = when(col("doc_id") % 4 === 0,
            unhex(webpHex(0, w, h, al)))
          .when(col("doc_id") % 4 === 1, unhex(webpHex(1, w, h, al)))
          .when(col("doc_id") % 4 === 2, unhex(webpHex(2, w, h, al)))
          .otherwise(payload(col("text")))
        Tables.t(s, d, "documents")
          .select(col("doc_id"), webpMeta(bin).as("m"))
          .select(col("doc_id"),
            col("m.well_formed").as("well_formed"),
            col("m.variant").as("variant"),
            col("m.width").as("width"),
            col("m.height").as("height"),
            col("m.has_alpha").as("has_alpha"))
      },
      Some("""SELECT doc_id, doc_id % 4 < 3 AS well_formed,
             |CASE doc_id % 4 WHEN 0 THEN 'vp8' WHEN 1 THEN 'vp8l'
             |WHEN 2 THEN 'vp8x' END AS variant,
             |CASE WHEN doc_id % 4 < 3
             |THEN CAST(doc_id % 600 + 16 AS BIGINT) END AS width,
             |CASE WHEN doc_id % 4 < 3
             |THEN CAST((doc_id * 7) % 400 + 16 AS BIGINT) END AS height,
             |CAST(CASE doc_id % 4 WHEN 0 THEN 0 WHEN 1 THEN doc_id % 2
             |WHEN 2 THEN doc_id % 2 END AS INTEGER) AS has_alpha
             |FROM documents""".stripMargin.replace('\n', ' '))),

    // mm16: FLAC STREAMINFO parse over a MIXED corpus — doc_id%3==0
    // rows carry a constructed 42-byte fLaC header whose five packed
    // fields all sweep (20-bit sample rate, 3-bit channel count,
    // 5-bit bit depth, 36-bit total-sample count crossing the nibble
    // boundary via doc_id%16 in the high nibble, and the
    // metadata-block last-flag bit on doc_id%2); the rest carry raw
    // text and must land on the well_formed=false NULL arm. The
    // oracle restates the construction plus the seconds integer
    // division, so the gate holds the whole bit-unpacking — including
    // the 36-bit straddle — per row. See [[Multimodal.flacStreamInfo]].
    Q("mm16_flac_streaminfo",
      (s, d) => {
        val srv = (lit(8000L) + (col("doc_id") * 37) % 180000)
          .cast("long")
        val chv = (col("doc_id") % 8 + 1).cast("long")
        val bpv = ((col("doc_id") * 3) % 32 + 1).cast("long")
        val tsv = ((col("doc_id") % 16) * 4294967296L +
          (col("doc_id") * 977) % 1000000007L).cast("long")
        val mbv = (col("doc_id") % 60000 + 16).cast("long")
        val xbv = (mbv + col("doc_id") % 100).cast("long")
        val packed = srv * 17592186044416L +        // << 44
          (chv - 1L) * 2199023255552L +             // << 41
          (bpv - 1L) * 68719476736L +               // << 36
          tsv
        val hdr = concat(lit("664C6143"),
          when(col("doc_id") % 2 === 0, "80").otherwise("00"),
          lit("000022"),
          lpad(hex(mbv), 4, "0"), lpad(hex(xbv), 4, "0"),
          lit("000000"), lit("000000"),
          lpad(hex(packed), 16, "0"),
          lit("0" * 32))
        val bin = when(col("doc_id") % 3 === 0, unhex(hdr))
          .otherwise(payload(col("text")))
        Tables.t(s, d, "documents")
          .select(col("doc_id"), flacStreamInfo(bin).as("m"))
          .select(col("doc_id"),
            col("m.well_formed").as("well_formed"),
            col("m.last_block").as("last_block"),
            col("m.min_block").as("min_block"),
            col("m.max_block").as("max_block"),
            col("m.sample_rate").as("sample_rate"),
            col("m.channels").as("channels"),
            col("m.bits_per_sample").as("bits_per_sample"),
            col("m.total_samples").as("total_samples"),
            col("m.seconds").as("seconds"))
      },
      Some("""WITH m AS (SELECT doc_id,
             |8000 + (doc_id * 37) % 180000 AS sr,
             |doc_id % 8 + 1 AS ch,
             |(doc_id * 3) % 32 + 1 AS bp,
             |(doc_id % 16) * 4294967296 +
             |(doc_id * 977) % 1000000007 AS ts,
             |doc_id % 60000 + 16 AS mb,
             |doc_id % 60000 + 16 + doc_id % 100 AS xb
             |FROM documents WHERE doc_id % 3 = 0)
             |SELECT doc_id, TRUE AS well_formed,
             |CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END
             |AS INTEGER) AS last_block,
             |CAST(mb AS INTEGER) AS min_block,
             |CAST(xb AS INTEGER) AS max_block,
             |CAST(sr AS INTEGER) AS sample_rate,
             |CAST(ch AS INTEGER) AS channels,
             |CAST(bp AS INTEGER) AS bits_per_sample,
             |CAST(ts AS BIGINT) AS total_samples,
             |CAST(ts // sr AS BIGINT) AS seconds FROM m
             |UNION ALL SELECT doc_id, FALSE, NULL, NULL, NULL, NULL,
             |NULL, NULL, NULL, NULL FROM documents
             |WHERE doc_id % 3 <> 0"""
        .stripMargin.replace('\n', ' '))),

    // mm17: TIFF parse over a MIXED corpus with BOTH byte orders —
    // doc_id%3==0 builds the little-endian (`II`) file, %3==1 the
    // SAME logical file big-endian (`MM`), %3==2 raw text (malformed
    // arm). Width is a SHORT entry (left-justified 2-byte value),
    // height a LONG (4-byte), and a third Compression entry must be
    // skipped by the tag scan — so the endian dispatch, both inline
    // value encodings, and unknown-tag skipping all sit under the
    // gate. See [[Multimodal.tiffMeta]].
    Q("mm17_tiff_meta",
      (s, d) => {
        val w = (col("doc_id") % 2000 + 1).cast("long")
        val h = ((col("doc_id") * 7) % 100000 + 1).cast("long")
        def be16(v: Column) = lpad(hex(v), 4, "0")
        def be32(v: Column) = lpad(hex(v), 8, "0")
        val leHex = concat(lit("49492A00"), le32hexCol(lit(8)),
          le16hexCol(lit(3)),
          // ImageWidth: SHORT in the first two value bytes
          lit("0001"), lit("0300"), le32hexCol(lit(1)),
          le16hexCol(w), lit("0000"),
          // ImageLength: LONG fills the value field
          lit("0101"), lit("0400"), le32hexCol(lit(1)), le32hexCol(h),
          // Compression (tag 259): present, must be skipped
          lit("0301"), lit("0300"), le32hexCol(lit(1)),
          le16hexCol(lit(1)), lit("0000"),
          lit("00000000"))
        val beHex = concat(lit("4D4D002A"), be32(lit(8)),
          be16(lit(3)),
          lit("0100"), lit("0003"), be32(lit(1)),
          be16(w), lit("0000"),
          lit("0101"), lit("0004"), be32(lit(1)), be32(h),
          lit("0103"), lit("0003"), be32(lit(1)),
          be16(lit(1)), lit("0000"),
          lit("00000000"))
        val bin = when(col("doc_id") % 3 === 0, unhex(leHex))
          .when(col("doc_id") % 3 === 1, unhex(beHex))
          .otherwise(payload(col("text")))
        Tables.t(s, d, "documents")
          .select(col("doc_id"), tiffMeta(bin).as("m"))
          .select(col("doc_id"),
            col("m.well_formed").as("well_formed"),
            col("m.endian").as("endian"),
            col("m.n_entries").as("n_entries"),
            col("m.width").as("width"),
            col("m.height").as("height"))
      },
      Some("""SELECT doc_id, doc_id % 3 < 2 AS well_formed,
             |CASE doc_id % 3 WHEN 0 THEN 'II' WHEN 1 THEN 'MM' END
             |AS endian,
             |CAST(CASE WHEN doc_id % 3 < 2 THEN 3 END AS INTEGER)
             |AS n_entries,
             |CASE WHEN doc_id % 3 < 2
             |THEN CAST(doc_id % 2000 + 1 AS BIGINT) END AS width,
             |CASE WHEN doc_id % 3 < 2
             |THEN CAST((doc_id * 7) % 100000 + 1 AS BIGINT) END
             |AS height FROM documents"""
        .stripMargin.replace('\n', ' ')))
  )
}

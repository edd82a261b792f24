package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column support (driver north star; absent from the
  * reference): image/audio/video payloads are opaque BINARY columns with
  * typed metadata travelling beside them. The Spark-side plumbing —
  * binary schema, per-row metadata extraction, frame explosion and
  * re-aggregation, partition behavior — is real and tested; the actual
  * codec DECODE step is a clearly-marked deterministic stub (`fakeDecode`)
  * because no image/audio libraries exist in this container. Swapping the
  * stub for a real decoder is a drop-in replacement of one expression (or
  * a mapPartitions batch-decode) — nothing else in the pipeline changes.
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

  /** STUB DECODE — deterministic fake of an image decode. A real
    * implementation would parse the codec header; this derives plausible
    * (width, height, channels) from a hash of the bytes so the downstream
    * schema/partitioning/aggregation plumbing is exercised honestly. */
  def fakeDecode(bin: Column): Column = struct(
    (pmod(xxhash64(bin), lit(608L)) + 32L).cast("int").as("width"),
    (pmod(xxhash64(bin, lit(1)), lit(608L)) + 32L).cast("int").as("height"),
    lit(3).as("channels"))

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
}

/** Driver-facing multimodal queries over `documents` (as the binary
  * carrier). mm01 is DuckDB-oracle-checked (byte size + magic bytes are
  * engine-independent); the stubbed-decode queries are rows-only checks
  * with determinism asserted in MultimodalSpec. */
object MultimodalQueries {
  import Multimodal._

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

    Q("mm02_image_meta",
      (s, d) => {
        val bin = payload(col("text"))
        Tables.t(s, d, "documents")
          .select(col("doc_id"), fakeDecode(bin).as("meta"))
          .select(
            col("doc_id"),
            col("meta.width").as("width"),
            col("meta.height").as("height"),
            col("meta.channels").as("channels"),
            (col("meta.width").cast("long") * col("meta.height") *
              col("meta.channels")).as("n_pixels"))
      },
      None),

    Q("mm03_resize_plan",
      (s, d) => {
        val bin = payload(col("text"))
        Tables.t(s, d, "documents")
          .select(col("doc_id"), fakeDecode(bin).as("meta"))
          .select(col("doc_id"),
            resizePlan(col("meta"), maxDim = 256).as("r"))
          .select(col("doc_id"), col("r.out_width").as("out_width"),
            col("r.out_height").as("out_height"))
      },
      None),

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
        .stripMargin.replace('\n', ' ')))
  )
}

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
}

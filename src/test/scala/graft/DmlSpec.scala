package graft

import org.apache.spark.sql.functions._

/** DML round-trip state tests (reference plans at
  * `/root/reference/tmp/crud.txt:178-279,480-504` never execute; these
  * assert real post-statement table state). */
class DmlSpec extends SparkSpec {

  test("insert VALUES appends exactly the new rows (m01)") {
    val out = q("m01_insert_values").build(spark, sf)
    assert(out.count() == 27L) // 25 nations + 2 inserted
    val added = out.filter(col("n_nationkey") >= 25)
      .orderBy("n_nationkey").collect()
    assert(added.map(_.getString(1)).toSeq == Seq("LEMURIA", "ZEALANDIA"))
  }

  test("insert SELECT appends the source subquery rows (m02)") {
    val base = Tables.t(spark, sf, "supplier")
    val expectedAdds = base.filter(col("s_acctbal") > 5000).count()
    val out = q("m02_insert_select").build(spark, sf)
    assert(out.count() == base.count() + expectedAdds)
    assert(out.filter(col("s_name").endsWith("-copy")).count() == expectedAdds)
  }

  test("update rewrites only matching rows (m03)") {
    val base = Tables.t(spark, sf, "supplier")
    val negBefore = base.filter(col("s_acctbal") < 0).count()
    val out = q("m03_update_where").build(spark, sf)
    assert(out.count() == base.count())
    // untouched rows identical
    val untouchedBefore = base.filter(col("s_acctbal") >= 0)
      .agg(sum(col("s_acctbal").cast("decimal(18,2)"))).collect().head.get(0)
    val untouchedAfter = out
      .join(base.filter(col("s_acctbal") >= 0).select("s_suppkey"), "s_suppkey")
      .agg(sum(col("s_acctbal").cast("decimal(18,2)"))).collect().head.get(0)
    assert(untouchedBefore == untouchedAfter)
    assert(negBefore == 0 ||
      out.filter(col("s_acctbal") < 0).count() < negBefore)
  }

  test("delete removes exactly the matching rows (m04)") {
    val base = Tables.t(spark, sf, "customer")
    val matching = base.filter(col("c_acctbal") < 0).count()
    val out = q("m04_delete_where").build(spark, sf)
    assert(out.count() == base.count() - matching)
    assert(out.filter(col("c_acctbal") < 0).count() == 0)
  }

  test("ddl roundtrip: create + insert + index + select (m05)") {
    val rows = q("m05_ddl_roundtrip").build(spark, sf)
      .orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq == Seq((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", 3.5)))
  }

  test("DML re-runs are idempotent (copy-on-write versions overwritten)") {
    val a = q("m01_insert_values").build(spark, sf).count()
    val b = q("m01_insert_values").build(spark, sf).count()
    assert(a == b)
  }

  test("commit pointer: readers resolve the committed version; the " +
    "mutation flips it atomically from v0 to v1") {
    import org.apache.spark.sql.functions._
    val dir = Dml.work("spec_commit", sf)
    val base = Tables.t(spark, sf, "supplier")
    Dml.update(base, dir, col("s_acctbal") < 0,
      Map("s_acctbal" -> (col("s_acctbal") + 500.0)))
    val latest = java.nio.file.Files
      .readString(java.nio.file.Paths.get(dir, "_latest")).trim
    assert(latest == "v1")
    assert(Dml.readLatest(spark, dir).count() == base.count())
  }
}

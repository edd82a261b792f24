package graft

/** API-contract tests for [[ExecutionContext]] — parity with the
  * reference's `src/context.rs:10-56` surface and the `tmp/crud.txt`
  * DDL/index tests. */
class ExecutionContextSpec extends SparkSpec {

  private def ctx = new ExecutionContext(spark).registerTestData(sf)

  test("unknown table surfaces the reference's error contract " +
    "(tmp/select.rs:357-364)") {
    val e = intercept[IllegalArgumentException] {
      ctx.execute("SELECT * FROM no_such_table")
    }
    assert(e.getMessage == "Table: no_such_table does not exist in database")
  }

  test("table() accessor enforces the same contract") {
    val e = intercept[IllegalArgumentException](ctx.table("ghost"))
    assert(e.getMessage.contains("does not exist in database"))
  }

  test("invalid dialect rejected; all 11 reference dialect keys accepted " +
    "(src/lib.rs:9-23)") {
    intercept[IllegalArgumentException](
      new ExecutionContext(spark, "oracle9i"))
    ExecutionContext.dialects.foreach(d =>
      new ExecutionContext(spark, d))
  }

  test("execute runs only the first statement (src/context.rs:49)") {
    val df = ctx.execute(
      "SELECT 1 AS a; SELECT 2 AS b")
    assert(df.columns.toSeq == Seq("a"))
  }

  test("executeAll runs every statement, returns the last") {
    val df = ctx.executeAll("SELECT 1 AS a; SELECT 2 AS b")
    assert(df.columns.toSeq == Seq("b"))
  }

  test("explain renders the analyzed logical plan (format_plan parity, " +
    "tmp/select.rs:625-746)") {
    val plan = ctx.explain("SELECT c_name FROM customer WHERE c_acctbal > 0")
    assert(plan.contains("Project"))
    assert(plan.contains("Filter"))
    assert(plan.contains("Relation") || plan.contains("SubqueryAlias"))
  }

  test("scalar-function passthrough resolves arbitrary registry functions " +
    "(tmp/select.rs:583-611)") {
    val row = ctx.execute(
      "SELECT reverse('abc') AS r, pow(2, 10) AS p, bit_count(7) AS b")
      .collect().head
    assert(row.getString(0) == "cba")
    assert(row.getDouble(1) == 1024.0)
  }

  test("create index: deterministic auto-name, duplicate error, " +
    "IF NOT EXISTS, unique flag (tmp/crud.txt:312-347)") {
    val c = ctx
    val ix = c.createIndex(None, "customer", Seq("c_custkey", "c_name"))
    assert(ix.name == "idx_customer_c_custkey_c_name")
    assert(!ix.unique)
    val e = intercept[IllegalArgumentException] {
      c.createIndex(None, "customer", Seq("c_custkey", "c_name"))
    }
    assert(e.getMessage.contains("already exists"))
    // IF NOT EXISTS is a no-op success
    c.createIndex(None, "customer", Seq("c_custkey", "c_name"),
      ifNotExists = true)
    val uix = c.createIndex(Some("u1"), "customer", Seq("c_custkey"),
      unique = true)
    assert(uix.unique)
    assert(c.indexes.map(_.name) == Seq("idx_customer_c_custkey_c_name", "u1"))
  }

  test("create index on missing table fails the catalog check") {
    intercept[IllegalArgumentException] {
      ctx.createIndex(None, "nope", Seq("x"))
    }
  }

  test("drop index: IF EXISTS tolerated, missing errors " +
    "(tmp/crud.txt:372-383)") {
    val c = ctx
    c.createIndex(Some("tmp_ix"), "customer", Seq("c_custkey"))
    c.dropIndex(Seq("tmp_ix"))
    assert(!c.indexes.exists(_.name == "tmp_ix"))
    intercept[IllegalArgumentException](c.dropIndex(Seq("tmp_ix")))
    c.dropIndex(Seq("tmp_ix"), ifExists = true)
  }

  test("CREATE INDEX / DROP INDEX parse through execute()") {
    val c = ctx
    c.execute("CREATE UNIQUE INDEX my_ix ON customer (c_custkey)")
    assert(c.indexes.exists(ix => ix.name == "my_ix" && ix.unique))
    c.execute("DROP INDEX my_ix")
    assert(!c.indexes.exists(_.name == "my_ix"))
  }

  test("drop table cascade removes the table's indexes " +
    "(tmp/crud.txt:349-371)") {
    val c = ctx
    import org.apache.spark.sql.types._
    val loc = Dml.work("spec_ddl", sf) + "/t1"
    c.execute("DROP TABLE IF EXISTS spec_t1")
    c.createTable("spec_t1",
      StructType(Seq(StructField("id", LongType))), loc)
    c.createIndex(None, "spec_t1", Seq("id"))
    c.dropTable(Seq("spec_t1"), cascade = true)
    assert(!c.tableExists("spec_t1"))
    assert(!c.indexes.exists(_.table == "spec_t1"))
    // missing table without IF EXISTS errors; with it, tolerated
    intercept[IllegalArgumentException](c.dropTable(Seq("spec_t1")))
    c.dropTable(Seq("spec_t1"), ifExists = true)
  }
}

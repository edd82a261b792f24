package graft

/** [[ExecutionContext.normalizeDialect]] — the per-dialect lexing shim
  * (reference constructor surface, `/root/reference/src/lib.rs:9-23`).
  * The rewrite itself is proven semantics-preserving by the hash gates
  * (q51/q52); these specs pin the LEXER-LEVEL contract: which dialects
  * rewrite, which pass through, and the opacity/guard rules that keep
  * the rewrite from touching strings, comments, or indexing.
  */
class DialectSpec extends SparkSpec {

  private def norm(sql: String, dialect: String): String =
    ExecutionContext.normalizeDialect(sql, dialect)

  test("passthrough dialects leave the statement byte-identical: " +
    "generic and postgres (the default — back-compat), hive and " +
    "bigquery (their quoting already IS Spark's)") {
    val sql = """SELECT "x", [y], TOP 5 FROM t -- "c" [d]"""
    for (d <- Seq("generic", "postgres", "hive", "bigquery"))
      assert(norm(sql, d) == sql, d)
  }

  test("double-quoted identifiers rewrite to backticks for every " +
    "double-quote dialect; \"\" unescapes to a quote inside the name") {
    for (d <- Seq("ansi", "duckdb", "redshift", "sqlite", "snowflake",
        "clickhouse", "mssql"))
      assert(norm("""SELECT "a", "t"."b c", "we""ird" FROM t""", d) ==
        "SELECT `a`, `t`.`b c`, `we\"ird` FROM t", d)
  }

  test("bracketed identifiers rewrite for mssql and sqlite only; ]] " +
    "unescapes; a backtick inside the name doubles in the output") {
    assert(norm("SELECT [a], [t].[b c], [a]]b], [t`x] FROM [t]", "mssql") ==
      "SELECT `a`, `t`.`b c`, `a]b`, `t``x` FROM `t`")
    assert(norm("SELECT [a] FROM [t]", "sqlite") ==
      "SELECT `a` FROM `t`")
    // snowflake has no bracket quoting: brackets pass through
    assert(norm("SELECT [a] FROM t", "snowflake") ==
      "SELECT [a] FROM t")
  }

  test("collection indexing survives under the bracket dialects: [ " +
    "after an identifier, ), ], backtick, or string is indexing") {
    val sql = "SELECT arr[0], m['k'], f(x)[1], g[0][1], `q`[2] FROM t"
    assert(norm(sql, "mssql") == sql)
    assert(norm(sql, "sqlite") == sql)
  }

  test("strings, comments (line + nested block), and backticked " +
    "identifiers are opaque to the rewrite") {
    val sql = "SELECT '[not] \"an\" ident', 'it''s', `\"keep\"` " +
      "/* \"c\" [d] /* nested */ */ FROM t -- \"tail\" [z]"
    assert(norm(sql, "mssql") == sql)
  }

  test("mssql TOP n and TOP (n) rewrite to a trailing LIMIT on a " +
    "top-level SELECT; other dialects and non-SELECT heads pass through") {
    assert(norm("SELECT TOP 3 a FROM t ORDER BY a", "mssql") ==
      "SELECT a FROM t ORDER BY a LIMIT 3")
    assert(norm("select top (7) * from t", "mssql") ==
      "select * from t LIMIT 7")
    assert(norm("SELECT TOP 3 a FROM t", "duckdb") ==
      "SELECT TOP 3 a FROM t")
    assert(norm("INSERT INTO t SELECT TOP 3 a FROM s", "mssql") ==
      "INSERT INTO t SELECT TOP 3 a FROM s")
  }

  test("executed contrast: the SAME double-quoted text is an identifier " +
    "under a quote dialect but a string literal under the postgres " +
    "default — the failure mode the q52 gate guards") {
    Tables.ensureRegistered(spark, sf)
    val sql = """SELECT "r_name" AS v FROM region ORDER BY "r_name""""
    val asIdent = new ExecutionContext(spark, "duckdb").execute(sql)
      .collect().map(_.getString(0)).toSeq
    val asString = new ExecutionContext(spark, "postgres").execute(sql)
      .collect().map(_.getString(0)).toSeq
    assert(asIdent.distinct.size > 1 && asIdent == asIdent.sorted)
    assert(asString.distinct == Seq("r_name"))
  }

  test("dialect-normalized DML routes through the same bridge: an " +
    "mssql-quoted UPDATE statement mutates the session view") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.t(spark, sf, "region")
    docs.createOrReplaceTempView("dialect_upd")
    val ctx = new ExecutionContext(spark, "mssql")
    ctx.execute(
      "UPDATE [dialect_upd] SET [r_name] = 'X' WHERE [r_regionkey] = 0")
    val got = spark.table("dialect_upd")
      .filter(col("r_regionkey") === 0)
      .select("r_name").collect().map(_.getString(0)).toSeq
    assert(got == Seq("X"))
    spark.catalog.dropTempView("dialect_upd")
  }
}

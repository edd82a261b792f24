package graft

import org.scalacheck.Gen

/** Property-style check of [[ExecutionContext.normalizeDialect]] over
  * randomly composed SQL-shaped token streams (identifiers in all four
  * quoting styles, string literals with escapes, line/block comments,
  * indexing, punctuation). Three invariants that no example-based spec
  * can pin as broadly:
  *  - passthrough dialects are the IDENTITY, byte-for-byte;
  *  - normalization is IDEMPOTENT (a normalized statement re-normalizes
  *    to itself — the rewrite never manufactures new rewrite sites);
  *  - single-quoted string literals survive VERBATIM in the output for
  *    every dialect (data is never mangled by identifier rules).
  * Fixed seed sequence, same scheme as CreateTableRewritePropSpec. */
class DialectPropSpec extends SparkSpec {

  private val word = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(4, Gen.alphaNumChar)
  } yield (h :: t).mkString

  // one SQL-shaped token; the generator leans on the tricky cases
  private val token: Gen[String] = Gen.frequency(
    4 -> word,
    2 -> word.map(w => s""""$w""""),          // double-quoted ident
    1 -> Gen.const("\"we\"\"ird\""),          // "" escape
    2 -> word.map(w => s"[$w]"),              // bracketed ident
    1 -> Gen.const("[a]]b]"),                 // ]] escape
    2 -> word.map(w => s"`$w`"),              // already-Spark
    2 -> word.map(w => s"'$w'"),              // string literal
    1 -> Gen.const("'it''s'"),                // '' escape
    1 -> Gen.const("'a \\' q'"),              // backslash escape
    1 -> word.map(w => s"arr[$w]"),           // indexing (abuts)
    1 -> Gen.const("m['k']"),                 // indexing after ident
    1 -> Gen.const("f(x)[1]"),                // indexing after )
    1 -> word.map(w => s"-- $w [c] \"d\"\n"), // line comment
    1 -> word.map(w => s"/* $w [c] /* \"n\" */ */"), // nested block
    3 -> Gen.oneOf(",", ".", "(", ")", "=", "<", ">", "+"))

  private val statement: Gen[String] = for {
    n <- Gen.choose(3, 25)
    ts <- Gen.listOfN(n, token)
    sep <- Gen.listOfN(n, Gen.oneOf(" ", " ", "  "))
  } yield "SELECT " + ts.zip(sep).map { case (t, s) => t + s }.mkString

  /** Single-quoted literal bodies of `sql`, via the same lexing rules
    * the normalizer applies (escapes honored, comments opaque). */
  private def stringLiterals(sql: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    val n = sql.length
    def nxt = if (i + 1 < n) sql.charAt(i + 1) else 0.toChar
    while (i < n) {
      sql.charAt(i) match {
        case '-' if nxt == '-' =>
          val e = sql.indexOf('\n', i); i = (if (e < 0) n else e + 1) - 1
        case '/' if nxt == '*' =>
          var depth = 1; var j = i + 2
          while (j < n && depth > 0) {
            if (j + 1 < n && sql.charAt(j) == '/' && sql.charAt(j + 1) == '*') {
              depth += 1; j += 2
            } else if (j + 1 < n && sql.charAt(j) == '*' &&
              sql.charAt(j + 1) == '/') { depth -= 1; j += 2 }
            else j += 1
          }
          i = j - 1
        case '\'' =>
          val b = new StringBuilder
          var j = i + 1
          var done = false
          while (j < n && !done) {
            val c = sql.charAt(j)
            if (c == '\\' && j + 1 < n) { b += c; b += sql.charAt(j + 1); j += 2 }
            else if (c == '\'' && j + 1 < n && sql.charAt(j + 1) == '\'') {
              b ++= "''"; j += 2
            } else if (c == '\'') { done = true; j += 1 }
            else { b += c; j += 1 }
          }
          out += b.result(); i = j - 1
        case _ => ()
      }
      i += 1
    }
    out.result()
  }

  test("normalizeDialect properties over 300 random statements: " +
    "passthrough identity, idempotence, string-literal preservation") {
    val rnd = new scala.util.Random(20260814L)
    def sample[A](g: Gen[A]): A =
      g(Gen.Parameters.default.withSize(12),
        org.scalacheck.rng.Seed(rnd.nextLong())).get
    val rewriting = Seq("ansi", "duckdb", "redshift", "sqlite",
      "snowflake", "clickhouse", "mssql")
    val passthrough = Seq("generic", "postgres", "hive", "bigquery")
    (0 until 300).foreach { _ =>
      val sql = sample(statement)
      passthrough.foreach { d =>
        assert(ExecutionContext.normalizeDialect(sql, d) == sql,
          s"$d must be identity on: $sql")
      }
      rewriting.foreach { d =>
        val once = ExecutionContext.normalizeDialect(sql, d)
        val twice = ExecutionContext.normalizeDialect(once, d)
        assert(twice == once,
          s"$d not idempotent on: $sql\n once: $once\n twice: $twice")
        assert(stringLiterals(once) == stringLiterals(sql),
          s"$d mangled a string literal in: $sql\n -> $once")
      }
    }
  }
}

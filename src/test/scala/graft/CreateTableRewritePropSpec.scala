package graft

import org.scalacheck.Gen

/** Property-style end-to-end check of the CREATE TABLE constraint
  * rewriter: random column lists (quoted names with commas/spaces, nested
  * MAP/STRUCT types, NOT NULL / PRIMARY KEY / typed DEFAULTs, table
  * constraints) are rendered to SQL, run through `execute`, and the
  * resulting REAL table + `graft.*` metadata must match the generated
  * spec exactly. Executing the rewritten DDL is the fidelity oracle —
  * any scanner mangling (split type args, swallowed quotes, misattributed
  * options) fails Spark's own parser or the property assertions. Uses
  * scalacheck generators with a fixed seed sequence (deterministic, no
  * scalatestplus bridge needed). */
class CreateTableRewritePropSpec extends SparkSpec {

  private case class GenCol(
      raw: String, // as written in DDL (possibly backticked)
      name: String, // unquoted
      tpe: String,
      notNull: Boolean,
      primaryKey: Boolean,
      default: Option[String])

  private val plainName = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.alphaNumChar)
  } yield (h :: t).mkString.toLowerCase

  // backticked names exercising the comma/space paths of the scanners
  private val quotedBase =
    Gen.oneOf("a,b col", "odd name", "my_cascade", "select")

  private val typedDefault: Map[String, Gen[String]] = Map(
    "INT" -> Gen.oneOf("0", "7", "1 + 2"),
    "STRING" -> Gen.oneOf("'x'", "'don''t'", "concat('a', 'b')"),
    "DECIMAL(10,2)" -> Gen.const("1.50"))

  private val genType = Gen.oneOf(
    "INT", "STRING", "DECIMAL(10,2)", "MAP<STRING,INT>",
    "ARRAY<STRUCT<a: INT, b: STRING>>")

  private def genCol(idx: Int): Gen[GenCol] = for {
    nm <- Gen.frequency(
      3 -> plainName.map(n => (s"$n$idx", s"$n$idx")),
      1 -> quotedBase.map(n => (s"`${n}_$idx`", s"${n}_$idx")))
    tpe <- genType
    nn <- Gen.oneOf(true, false)
    pk <- Gen.frequency(4 -> Gen.const(false), 1 -> Gen.const(true))
    df <- typedDefault.get(tpe) match {
      case Some(g) => Gen.option(g)
      case None => Gen.const(None)
    }
  } yield GenCol(nm._1, nm._2, tpe, nn, pk, df)

  private def render(cols: Seq[GenCol], extra: Seq[String]): String = {
    val colDdl = cols.map { c =>
      val opts = Seq(
        if (c.notNull) Some("NOT NULL") else None,
        if (c.primaryKey) Some("PRIMARY KEY") else None,
        c.default.map("DEFAULT " + _)).flatten
      (s"${c.raw} ${c.tpe}" +: opts).mkString(" ")
    }
    (colDdl ++ extra).mkString(", ")
  }

  test("property: generated constraint DDL executes through the rewriter " +
    "with exact schema and graft.* metadata round-trip (40 cases)") {
    val c = new ExecutionContext(spark)
    val work = java.nio.file.Files
      .createTempDirectory("graft_prop").toString
    val rnd = new scala.util.Random(20260812L)
    def sample[A](g: Gen[A]): A =
      g(Gen.Parameters.default.withSize(10),
        org.scalacheck.rng.Seed(rnd.nextLong())).get
    (0 until 40).foreach { n =>
      val cols = (0 until (2 + rnd.nextInt(3)))
        .map(i => sample(genCol(i)))
      val tableCons = Seq(
        if (rnd.nextBoolean())
          Some(s"UNIQUE (${cols.head.raw})") else None,
        if (rnd.nextBoolean())
          Some(s"CHECK (${cols.head.raw} IS NOT NULL)") else None).flatten
      val tbl = s"prop_t$n"
      val stmt = s"CREATE TABLE $tbl (${render(cols, tableCons)}) " +
        s"USING parquet LOCATION '$work/$tbl'"
      c.execute(s"DROP TABLE IF EXISTS $tbl")
      c.execute(stmt) // the rewritten DDL must parse and run
      val schema = c.table(tbl).schema
      assert(schema.fieldNames.toSeq == cols.map(_.name),
        s"schema mismatch for: $stmt")
      val props = c.tableProperties(tbl)
      val pkCols = cols.filter(_.primaryKey).map(_.name)
      assert(props.get("graft.primary_key") ==
        (if (pkCols.nonEmpty) Some(pkCols.mkString(",")) else None), stmt)
      val nnCols = cols.filter(x => x.notNull || x.primaryKey).map(_.name)
      assert(props.get("graft.notnull") ==
        (if (nnCols.nonEmpty) Some(nnCols.mkString(",")) else None), stmt)
      cols.filter(_.default.isDefined).foreach { col =>
        assert(props.get(s"graft.default.${col.name}") == col.default, stmt)
      }
      assert(props.contains("graft.constraint.unique.0") ==
        tableCons.exists(_.startsWith("UNIQUE")), stmt)
      assert(props.contains("graft.constraint.check.0") ==
        tableCons.exists(_.startsWith("CHECK")), stmt)
      c.execute(s"DROP TABLE IF EXISTS $tbl")
    }
  }
}

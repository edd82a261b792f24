package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over two
  * `array<double>` columns — the one place in this engine where a custom
  * `Expression` with `doGenCode` is genuinely warranted (SURVEY §7.3):
  * the built-in formulation (`aggregate`/`zip_with` higher-order functions)
  * expresses the same math but evaluates interpreted, outside whole-stage
  * codegen, walking three lambda trees per pair. This compiles to a single
  * fused primitive loop — one pass computes dot product and both norms —
  * and participates in whole-stage codegen, so the similarity hot path
  * (every candidate pair in KNN / LSH-probe / IVF ranking) stays in
  * generated code.
  *
  * Result = dot / (sqrt(na) * sqrt(nb)) — the two-sqrt form, bit-identical
  * to the previous dot/l2norm composition and to the DuckDB oracle's
  * double-list cosine after 4-dp rounding. Null arrays propagate null;
  * a null ELEMENT in the common prefix also propagates null (the HOF's
  * null product nulls the fold — reading it as 0.0 would fabricate a
  * finite wrong similarity); length mismatch uses the common prefix;
  * zero-norm inputs yield NaN (same as the compositional form).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // Each input may be array<double> OR array<float> — float elements are
  // widened per element inside the fused loop (exact), so callers pass the
  // raw parquet `array<float>` embedding directly. The previous
  // `transform(v, cast)` pre-conversion was a CodegenFallback HOF that
  // dragged the ENTIRE projection out of whole-stage codegen (caught by
  // the DedupSpec codegen-span test) and allocated a converted array per
  // row.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<double|float> args, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  // per-plan constants, hoisted so the interpreted path pays no per-row
  // dataType pattern-match
  @transient private lazy val leftFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val rightFloat: Boolean = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "cosine_sim"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def get(arr: String, idx: String, float: Boolean) =
        if (float) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      // null-element scan SEPARATE from the arithmetic: interleaving
      // isNullAt into the fused loop cost ~30% on the e01/e03 hot path;
      // a bitmap pre-scan keeps the main loop branch-free
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    ${ev.isNull} = true; break;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xv = ${get(a, i, leftFloat)};
         |    double $yv = ${get(b, i, rightFloat)};
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  ${ev.value} = $dot /
         |    (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Native random-hyperplane sign bucket over an `array<double>` vector —
  * the LSH bucketing hot path of ANN probing (e03) and embedding near-dup
  * (d06). The HOF formulation ([[Similarity.signBucketHof]]) walks, PER
  * BIT, an interpreted `zip_with` (hash-derived hyperplane component per
  * dimension) plus an `aggregate` fold — bits × dims lambda evaluations
  * per row. This is one fused loop using the identical math: component
  * (i, d) = (pmod(hashInt(d, hashInt(i, 42)), 2001) - 1000) / 1000.0 —
  * exactly what `xxhash64(lit(i), dIdx)` + `pmod`/cast evaluate — with the
  * same ascending-dimension summation order, so buckets are bit-identical
  * (asserted in SimilaritySpec). Empty vectors — and vectors containing a
  * null ELEMENT — bucket to 0: the HOF's `zip_with` null (padding or
  * element) nulls the plane sum, and `when(null >= 0, bit)` falls to the
  * 0 branch for every plane. */
case class SignBucket(child: Expression, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _)
          if bits > 0 && bits <= 63 =>
        TypeCheckResult.TypeCheckSuccess
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        TypeCheckResult.TypeCheckFailure(
          s"sign_bucket needs 0 < bits <= 63, got $bits")
      case other => TypeCheckResult.TypeCheckFailure(
        s"sign_bucket expects array<double|float>, got ${other.simpleString}")
    }
  }

  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def prettyName: String = "sign_bucket"

  override protected def nullSafeEval(input: Any): Any =
    SignBucket.compute(input.asInstanceOf[ArrayData], bits, isFloat)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val helper = SignBucket.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.compute($a, $bits, $isFloat);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): SignBucket = copy(child = newChild)
}

object SignBucket {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  /** Public because generated code calls it. `isFloat` widens float
    * elements per access (exact — identical to a pre-cast double array). */
  def compute(a: ArrayData, bits: Int, isFloat: Boolean): Long = {
    val n = a.numElements()
    if (n == 0) return 0L // HOF null-padding semantics (see scaladoc)
    var d0 = 0
    while (d0 < n) { // a null element nulls every plane sum -> bucket 0
      if (a.isNullAt(d0)) return 0L
      d0 += 1
    }
    var out = 0L
    var i = 0
    while (i < bits) {
      val planeSeed = XXH64.hashInt(i, 42L)
      var acc = 0.0
      var d = 0
      while (d < n) {
        val h = XXH64.hashInt(d, planeSeed)
        val m = ((h % 2001L) + 2001L) % 2001L
        val x = if (isFloat) a.getFloat(d).toDouble else a.getDouble(d)
        acc += x * ((m - 1000L).toDouble / 1000.0)
        d += 1
      }
      if (acc >= 0) out |= 1L << i
      i += 1
    }
    out
  }
}

/** Native L2 norm over an `array<double|float>` vector — same motivation
  * and same exactness contract as [[CosineSimilarity]]: ascending-index
  * `acc += x*x` fold (bit-identical to the `aggregate` HOF it replaces,
  * asserted in SimilaritySpec), `sqrt` at the end, float elements widened
  * per access. Empty array → 0.0, null array → null, and a null ELEMENT
  * → null (the HOF fold's null propagation — not a silent 0.0 read). */
case class NormL2(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"norm_l2 expects array<double|float>, got ${other.simpleString}")
    }
  }

  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "norm_l2"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val get =
        if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      // bitmap pre-scan, branch-free arithmetic loop (see CosineSimilarity)
      s"""
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |}
         |if (!${ev.isNull}) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = $get;
         |    $acc += $x * $x;
         |  }
         |  ${ev.value} = java.lang.Math.sqrt($acc);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): NormL2 = copy(child = newChild)
}

/** Native integer dot product over two `array<bigint>` columns — the
  * quantized-similarity hot path (e12 nearest-centroid, the k-means step):
  * i1 = Σ aᵢ·bᵢ over the common prefix. The HOF formulation
  * (`aggregate(zip_with(a, b, _*_), 0L, _+_)`) is interpreted and walks
  * two lambda trees per element PER CANDIDATE PAIR; this is one fused
  * primitive loop inside whole-stage codegen. Exact integer math — outputs
  * identical to the HOF form; null array → null, a null element in the
  * common prefix → null (the HOF's null fold), length mismatch → common
  * prefix (zip_with's null padding nulls the fold only when the shorter
  * side runs out — this engine only ever dots equal-length arrays, and the
  * prefix rule matches CosineSimilarity's). */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"long_dot expects array<bigint> args, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "long_dot"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getLong(i) * y.getLong(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    ${ev.isNull} = true; break;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  import org.apache.spark.sql.GraftBridge

  /** Column-API entry point for [[CosineSimilarity]]. */
  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column-API entry point for [[SignBucket]]. */
  def signBucket(v: Column, bits: Int): Column =
    GraftBridge.column(SignBucket(GraftBridge.expression(v), bits))

  /** Column-API entry point for [[NormL2]]. */
  def normL2(v: Column): Column =
    GraftBridge.column(NormL2(GraftBridge.expression(v)))

  /** Column-API entry point for [[LongDot]]: Σ aᵢ·bᵢ over array<bigint>. */
  def longDot(a: Column, b: Column): Column =
    GraftBridge.column(LongDot(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}

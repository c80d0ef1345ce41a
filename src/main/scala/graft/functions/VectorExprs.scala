package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over float/double
  * array columns.
  *
  * Why custom (SURVEY §7.3 preference order (b)): the composable form —
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` — is a higher-order
  * function, which Catalyst evaluates interpreted (no whole-stage
  * codegen) and which materializes an intermediate products array per
  * row. This expression generates a single fused primitive loop (dot +
  * both norms in one pass, no allocation). Arithmetic is identical to
  * the HOF form on well-formed inputs: each element widened to double,
  * sequential index-ascending sums, `dot / (sqrt(na) * sqrt(nb))` — so
  * results are bit-for-bit equal (asserted in `VectorExprsSpec`) and
  * the DuckDB oracle parity is preserved. Degenerate inputs are total:
  * zero-norm vectors and length mismatches yield NULL (the HOF form
  * throws under ANSI / NaN-or-NULL otherwise; NULL sorts LAST in a
  * descending top-k, NaN would sort first).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects array<float|double>, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** NULL results can arise from non-null inputs (null element, length
    * mismatch, zero norm), so the expression must declare itself
    * nullable regardless of child nullability — otherwise codegen binds
    * `ev.isNull` to the literal `false` and the interpreted path lies
    * to UnsafeProjection. */
  override def nullable: Boolean = true

  /** Null array, any null element, length mismatch, or a zero-norm side
    * → NULL, matching the HOF form exactly: `zip_with` null-pads
    * mismatched lengths (nulling the aggregate) and Spark's `Divide`
    * returns NULL on a zero divisor. NaN must never escape: it sorts
    * ABOVE every real similarity in a descending top-k. */
  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    val (fa, fb) = (isFloat(left), isFloat(right))
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (fa) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (fb) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) return null
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val getA = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = $getA;
         |    double $y = $getB;
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull} && ($na == 0.0 || $nb == 0.0)) { ${ev.isNull} = true; }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** murmur3 fmix64 avalanche of (child xor c) — wrapping 64-bit
  * arithmetic (deliberately overflow-friendly, which ANSI-mode SQL
  * multiplication is not). Used to derive independent MinHash
  * permutations from one base hash. */
case class Mix64(child: Expression, c: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  private def fmix(x0: Long): Long = {
    var z = x0 ^ c
    z ^= (z >>> 33); z *= 0xFF51AFD7ED558CCDL
    z ^= (z >>> 33); z *= 0xC4CEB9FE1A85EC53L
    z ^ (z >>> 33)
  }

  override def nullSafeEval(v: Any): Any = fmix(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.Mix64Impl.fmix($x, ${c}L)")

  override protected def withNewChildInternal(newChild: Expression): Mix64 =
    copy(child = newChild)
}

/** Static helper referenced from generated code. */
object Mix64Impl {
  /** Golden-ratio odd constant parameterizing the mix64 permutation
    * family (permutation p uses c = golden·(2p+1)); the single source
    * shared by the relational aggregate, the streaming inline form,
    * and the native `MinHashSig` expression so all three are
    * bit-identical. */
  val golden = 0x9E3779B97F4A7C15L

  def fmix(x0: Long, c: Long): Long = {
    var z = x0 ^ c
    z ^= (z >>> 33); z *= 0xFF51AFD7ED558CCDL
    z ^= (z >>> 33); z *= 0xC4CEB9FE1A85EC53L
    z ^ (z >>> 33)
  }
}

object VectorExprs {
  /** Column API: fmix64(x xor c). */
  def mix64(x: Column, c: Long): Column =
    Bridge.column(Mix64(Bridge.expression(x), c))

  /** Column API: native fused cosine similarity. */
  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))
}

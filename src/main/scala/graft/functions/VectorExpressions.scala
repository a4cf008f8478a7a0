package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst vector-distance expressions.
  *
  * Spark-first re-expression of the reference distance kernel
  * (/root/reference/src/distance.cpp:6-43, include/distance.h): instead of
  * hand-written AVX2 intrinsics, each expression emits a tight primitive
  * `double` loop via `doGenCode`, which participates in whole-stage codegen
  * and is auto-vectorized by the JIT. No boxing, no UDF serialization.
  *
  * All math accumulates in `double` (inputs are float vectors) so results
  * are bit-stable and match a double-precision oracle.
  */
trait VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
}

/** Squared L2 distance — the reference's native metric
  * (distance.cpp:l2_distance_avx2 returns the un-rooted sum). */
case class L2SqDistance(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "v_l2sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      s += d * d; i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double)$a.getFloat($i) - (double)$b.getFloat($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Euclidean (rooted) L2 distance. */
case class L2Distance(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "v_l2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      s += d * d; i += 1
    }
    math.sqrt(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double)$a.getFloat($i) - (double)$b.getFloat($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Inner (dot) product. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "v_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double)$a.getFloat($i) * (double)$b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity: dot(a,b) / (|a| * |b|); 0.0 when either norm is 0. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "v_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xa = x.getFloat(i).toDouble; val yb = y.getFloat(i).toDouble
      dot += xa * yb; na += xa * xa; nb += yb * yb; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xa = ctx.freshName("xa"); val yb = ctx.freshName("yb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xa = (double)$a.getFloat($i);
         |  double $yb = (double)$b.getFloat($i);
         |  $dot += $xa * $yb; $na += $xa * $xa; $nb += $yb * $yb;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of a single vector. */
case class VectorNorm(child: Expression) extends UnaryExpression {
  override def prettyName: String = "v_norm"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"v_norm requires array<float> input, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0; var i = 0; val n = x.numElements()
    while (i < n) { val v = x.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double)$a.getFloat($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** sq8_adc(codes array<int>, qv array<float>) → double: decoded-ADC
  * squared distance against the SQ8 grid baked in as literals — one
  * native pass replacing a 64-step HOF fold whose interpreted
  * element_at chain measured ~3× the whole query's useful work. The
  * arithmetic (q_j − (mn_j + c_j·scale_j))², summed in dimension
  * order, is identical op-for-op to the DuckDB oracle's list fold. */
case class Sq8AdcDistance(codes: Expression, qv: Expression,
    mins: Seq[Double], scales: Seq[Double])
  extends BinaryExpression with codegen.CodegenFallback {

  // Seq constructor fields keep case-class structural equality (Array
  // fields would compare by reference and defeat Catalyst CSE/reuse);
  // the hot loop still reads primitive arrays
  private lazy val mnArr: Array[Double] = mins.toArray
  private lazy val scArr: Array[Double] = scales.toArray

  override def left: Expression = codes
  override def right: Expression = qv
  override def prettyName: String = "sq8_adc"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, qv.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sq8_adc requires (array<int>, array<float>), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val cs = a.asInstanceOf[ArrayData]; val q = b.asInstanceOf[ArrayData]
    val n = math.min(math.min(cs.numElements(), q.numElements()), mnArr.length)
    var s = 0.0; var i = 0
    while (i < n) {
      val d = q.getFloat(i).toDouble - (mnArr(i) + cs.getInt(i) * scArr(i))
      s += d * d; i += 1
    }
    s
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(codes = newLeft, qv = newRight)
}

/** random_project(vec) → array<float>: dense ±1 random projection
  * (Achlioptas/JL) of a float vector onto `outDim` dimensions, the sign
  * matrix baked in as literals — one pass, each output coordinate a
  * fixed-order double multiply-accumulate cast to float once at the
  * end (the DuckDB oracle mirrors the fold term-for-term). The
  * dimensionality-reduction primitive of v_rp_search: with an unscaled
  * ±1 matrix, projected squared distances concentrate around outDim·d²
  * (JL lemma; the conventional 1/√outDim scaling is omitted because
  * ranking is scale-invariant), so a 4× narrower vector ranks a
  * shortlist almost as well as the original. */
case class RandomProject(child: Expression, signs: Seq[Double], outDim: Int)
  extends UnaryExpression with codegen.CodegenFallback {

  require(outDim >= 1 && signs.length % outDim == 0,
    s"signs length ${signs.length} must be a multiple of outDim $outDim")

  private lazy val sArr: Array[Double] = signs.toArray
  private lazy val inDim: Int = signs.length / outDim
  // null-element scan only where the schema says nulls are possible
  private lazy val mayHaveNulls: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def prettyName: String = "random_project"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"random_project requires array<float>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    // inDim is a declared parameter of a fixed sign matrix, so a
    // shorter vector is a data error — a silent partial sum would put
    // zero-padded projections into shortlists with no signal. Null
    // elements would read as zero terms (same degraded-signal failure),
    // so they are rejected too — one bitmap pass, not per-MAC checks.
    require(v.numElements() == inDim,
      s"random_project expects $inDim-dim vectors, got ${v.numElements()}")
    if (mayHaveNulls) {
      var j0 = 0
      while (j0 < inDim) {
        require(!v.isNullAt(j0),
          s"random_project: null element at index $j0 — impute or filter upstream")
        j0 += 1
      }
    }
    val n = inDim
    val out = new Array[Float](outDim)
    var i = 0
    while (i < outDim) {
      var s = 0.0
      var j = 0
      while (j < n) {
        s += sArr(i * inDim + j) * v.getFloat(j).toDouble
        j += 1
      }
      out(i) = s.toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

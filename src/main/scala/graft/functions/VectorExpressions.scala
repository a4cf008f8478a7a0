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
  * `double` loop via `doGenCode`, which participates in whole-stage codegen.
  * No boxing, no UDF serialization.
  *
  * All math accumulates in `double` (inputs are float vectors) so results
  * are bit-stable and match a double-precision oracle.
  *
  * LANE-4 FOLD CONTRACT (the kernels' pinned summation order): element i
  * accumulates into lane i mod 4, each lane a sequential left fold from
  * 0.0 in ascending i, lanes combine as (s0 + s1) + (s2 + s3). A single
  * sequential fold is one FP-add dependency chain — at 4-5 cycle add
  * latency it caps the 64-dim kernel near 16 Meval/s per core no matter
  * how wide the machine is (measured: the r11 kernel bench sat exactly
  * on that wall, ~4× below the reference's FMA kernel,
  * distance_bench.cpp:20-48). Four independent chains pipeline the adds
  * and recover ~3×. IEEE addition is not associative, so the lane
  * structure is part of the semantic contract: the SAME structure is
  * replicated in interpreted eval, codegen, the driver-side serving
  * replica (Serving.l2sq), the kernel micro-bench, and every oracle fold
  * that mirrors these kernels ([[graft.functions.FoldSql.lane4]]) —
  * results stay bit-identical across engines, exactly as before, just
  * under the faster fold law. Plans that fold with zip_with/aggregate
  * HOFs (pca, centroid drift, hard negatives, quantize error) keep their
  * own sequential contract and are untouched.
  */
/** The lane-4 kernels: ONE implementation each for interpreted eval
  * (ArrayData), the driver-side float[] replicas (serving probe
  * ranking, the kernel micro-bench), and the codegen emitters — so the
  * fold law literally cannot drift between paths. See the fold
  * contract in this file's header. */
object VectorKernels {

  /** Generated-code fragment: `code` declares fresh locals, `value` is
    * the expression holding the result. */
  final case class Snippet(code: String, value: String)

  def l2sq(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    val n4 = n - (n & 3)
    var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
    var i = 0
    while (i < n4) {
      val d0 = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      val d1 = x.getFloat(i + 1).toDouble - y.getFloat(i + 1).toDouble
      val d2 = x.getFloat(i + 2).toDouble - y.getFloat(i + 2).toDouble
      val d3 = x.getFloat(i + 3).toDouble - y.getFloat(i + 3).toDouble
      s0 += d0 * d0; s1 += d1 * d1; s2 += d2 * d2; s3 += d3 * d3
      i += 4
    }
    if (i < n) { val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble; s0 += d * d; i += 1 }
    if (i < n) { val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble; s1 += d * d; i += 1 }
    if (i < n) { val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble; s2 += d * d }
    (s0 + s1) + (s2 + s3)
  }

  def dot(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    val n4 = n - (n & 3)
    var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
    var i = 0
    while (i < n4) {
      s0 += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      s1 += x.getFloat(i + 1).toDouble * y.getFloat(i + 1).toDouble
      s2 += x.getFloat(i + 2).toDouble * y.getFloat(i + 2).toDouble
      s3 += x.getFloat(i + 3).toDouble * y.getFloat(i + 3).toDouble
      i += 4
    }
    if (i < n) { s0 += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    if (i < n) { s1 += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    if (i < n) { s2 += x.getFloat(i).toDouble * y.getFloat(i).toDouble }
    (s0 + s1) + (s2 + s3)
  }

  /** (dot, |a|², |b|²) in one pass — the cosine's three lane-4 sums. */
  def cosineParts(x: ArrayData, y: ArrayData): (Double, Double, Double) = {
    val n = math.min(x.numElements(), y.numElements())
    var d0 = 0.0; var d1 = 0.0; var d2 = 0.0; var d3 = 0.0
    var a0 = 0.0; var a1 = 0.0; var a2 = 0.0; var a3 = 0.0
    var b0 = 0.0; var b1 = 0.0; var b2 = 0.0; var b3 = 0.0
    var i = 0
    while (i < n) {
      val xa = x.getFloat(i).toDouble; val yb = y.getFloat(i).toDouble
      (i & 3) match {
        case 0 => d0 += xa * yb; a0 += xa * xa; b0 += yb * yb
        case 1 => d1 += xa * yb; a1 += xa * xa; b1 += yb * yb
        case 2 => d2 += xa * yb; a2 += xa * xa; b2 += yb * yb
        case _ => d3 += xa * yb; a3 += xa * xa; b3 += yb * yb
      }
      i += 1
    }
    ((d0 + d1) + (d2 + d3), (a0 + a1) + (a2 + a3), (b0 + b1) + (b2 + b3))
  }

  def normSq(x: ArrayData): Double = {
    val n = x.numElements()
    val n4 = n - (n & 3)
    var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
    var i = 0
    while (i < n4) {
      val v0 = x.getFloat(i).toDouble; val v1 = x.getFloat(i + 1).toDouble
      val v2 = x.getFloat(i + 2).toDouble; val v3 = x.getFloat(i + 3).toDouble
      s0 += v0 * v0; s1 += v1 * v1; s2 += v2 * v2; s3 += v3 * v3
      i += 4
    }
    if (i < n) { val v = x.getFloat(i).toDouble; s0 += v * v; i += 1 }
    if (i < n) { val v = x.getFloat(i).toDouble; s1 += v * v; i += 1 }
    if (i < n) { val v = x.getFloat(i).toDouble; s2 += v * v }
    (s0 + s1) + (s2 + s3)
  }

  /** float[] twins for the driver-side replicas. Same lane law. */
  def l2sqF(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    val n4 = n - (n & 3)
    var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
    var i = 0
    while (i < n4) {
      val d0 = a(i).toDouble - b(i).toDouble
      val d1 = a(i + 1).toDouble - b(i + 1).toDouble
      val d2 = a(i + 2).toDouble - b(i + 2).toDouble
      val d3 = a(i + 3).toDouble - b(i + 3).toDouble
      s0 += d0 * d0; s1 += d1 * d1; s2 += d2 * d2; s3 += d3 * d3
      i += 4
    }
    if (i < n) { val d = a(i).toDouble - b(i).toDouble; s0 += d * d; i += 1 }
    if (i < n) { val d = a(i).toDouble - b(i).toDouble; s1 += d * d; i += 1 }
    if (i < n) { val d = a(i).toDouble - b(i).toDouble; s2 += d * d }
    (s0 + s1) + (s2 + s3)
  }

  def dotF(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    val n4 = n - (n & 3)
    var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
    var i = 0
    while (i < n4) {
      s0 += a(i).toDouble * b(i).toDouble
      s1 += a(i + 1).toDouble * b(i + 1).toDouble
      s2 += a(i + 2).toDouble * b(i + 2).toDouble
      s3 += a(i + 3).toDouble * b(i + 3).toDouble
      i += 4
    }
    if (i < n) { s0 += a(i).toDouble * b(i).toDouble; i += 1 }
    if (i < n) { s1 += a(i).toDouble * b(i).toDouble; i += 1 }
    if (i < n) { s2 += a(i).toDouble * b(i).toDouble }
    (s0 + s1) + (s2 + s3)
  }

  def cosineF(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    val n4 = n - (n & 3)
    var d0 = 0.0; var d1 = 0.0; var d2 = 0.0; var d3 = 0.0
    var a0 = 0.0; var a1 = 0.0; var a2 = 0.0; var a3 = 0.0
    var b0 = 0.0; var b1 = 0.0; var b2 = 0.0; var b3 = 0.0
    var i = 0
    while (i < n4) {
      var xa = a(i).toDouble; var yb = b(i).toDouble
      d0 += xa * yb; a0 += xa * xa; b0 += yb * yb
      xa = a(i + 1).toDouble; yb = b(i + 1).toDouble
      d1 += xa * yb; a1 += xa * xa; b1 += yb * yb
      xa = a(i + 2).toDouble; yb = b(i + 2).toDouble
      d2 += xa * yb; a2 += xa * xa; b2 += yb * yb
      xa = a(i + 3).toDouble; yb = b(i + 3).toDouble
      d3 += xa * yb; a3 += xa * xa; b3 += yb * yb
      i += 4
    }
    if (i < n) { val xa = a(i).toDouble; val yb = b(i).toDouble
      d0 += xa * yb; a0 += xa * xa; b0 += yb * yb; i += 1 }
    if (i < n) { val xa = a(i).toDouble; val yb = b(i).toDouble
      d1 += xa * yb; a1 += xa * xa; b1 += yb * yb; i += 1 }
    if (i < n) { val xa = a(i).toDouble; val yb = b(i).toDouble
      d2 += xa * yb; a2 += xa * xa; b2 += yb * yb }
    val dd = (d0 + d1) + (d2 + d3)
    val na = (a0 + a1) + (a2 + a3)
    val nb = (b0 + b1) + (b2 + b3)
    if (na == 0.0 || nb == 0.0) 0.0
    else dd / (math.sqrt(na) * math.sqrt(nb))
  }

  def normSqF(a: Array[Float]): Double = {
    val n = a.length
    val n4 = n - (n & 3)
    var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
    var i = 0
    while (i < n4) {
      val v0 = a(i).toDouble; val v1 = a(i + 1).toDouble
      val v2 = a(i + 2).toDouble; val v3 = a(i + 3).toDouble
      s0 += v0 * v0; s1 += v1 * v1; s2 += v2 * v2; s3 += v3 * v3
      i += 4
    }
    if (i < n) { val v = a(i).toDouble; s0 += v * v; i += 1 }
    if (i < n) { val v = a(i).toDouble; s1 += v * v; i += 1 }
    if (i < n) { val v = a(i).toDouble; s2 += v * v }
    (s0 + s1) + (s2 + s3)
  }

  /** SIMD availability, probed once. Guarded so a JVM without the
    * incubator module degrades to the scalar twins instead of
    * propagating VectorSimd's initializer error. */
  private val useSimd: Boolean =
    try VectorSimd.available catch { case _: Throwable => false }

  /** Best-available float[] kernels — the dispatch the SCAN PATH's
    * generated code calls. Pre-r13 the emitters inlined the lane-4
    * loop over per-element ArrayData virtual access, and the measured
    * 8× gap between the scan (5.6 Meval/s) and kernel (45.9 Meval/s)
    * numbers was exactly that row decode. Staging each operand into a
    * primitive float[] once per row (UnsafeArrayData.toFloatArray is
    * one bulk Platform.copyMemory) and running the spec-pinned float[]
    * twin — the SIMD one when the Vector API is usable — closes it.
    * Generated Java cannot REFERENCE the incubator module (Janino),
    * but an invokestatic into this pre-compiled dispatcher is plain
    * bytecode; bit-identity across scalar/SIMD is the lane-4 fold
    * contract (VectorKernelsSpec pins all paths), so the dispatch is
    * a pure performance choice and oracles are untouched. */
  def l2sqBest(a: Array[Float], b: Array[Float]): Double =
    if (useSimd) VectorSimd.l2sqV(a, b) else l2sqF(a, b)

  def dotBest(a: Array[Float], b: Array[Float]): Double =
    if (useSimd) VectorSimd.dotV(a, b) else dotF(a, b)

  /** Final cosine (zero-norm → 0.0 rule included on both paths). */
  def cosineBest(a: Array[Float], b: Array[Float]): Double =
    if (useSimd) VectorSimd.cosineV(a, b) else cosineF(a, b)

  def normSqBest(a: Array[Float]): Double = normSqF(a)

  /** Row-side staging helper the generated code calls: copy an
    * ArrayData's floats into `scratch` when it can be reused (right
    * length), else allocate. For UnsafeArrayData the copy is one bulk
    * Platform.copyMemory off the row's backing bytes; other layouts
    * fall back to toFloatArray. Scratch is a per-operand MUTABLE STATE
    * field of the generated class — task-confined (one instance per
    * partition task), so reuse is race-free, and at a fixed dim the
    * steady state is zero allocation per row. */
  def stageInto(a: ArrayData, scratch: Array[Float]): Array[Float] = a match {
    case u: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData =>
      val n = u.numElements()
      val dst = if (scratch != null && scratch.length == n) scratch
                else new Array[Float](n)
      val header = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .calculateHeaderPortionInBytes(n)
      org.apache.spark.unsafe.Platform.copyMemory(
        u.getBaseObject, u.getBaseOffset + header,
        dst, org.apache.spark.unsafe.Platform.FLOAT_ARRAY_OFFSET,
        n.toLong * 4)
      dst
    case other => other.toFloatArray
  }

  /** Per-operand staging: a FOLDABLE operand (the serving pattern is
    * column-vs-literal probe) converts to float[] ONCE at plan compile
    * and rides the references array — its Literal holds a
    * GenericArrayData whose toFloatArray is a boxed per-element loop,
    * and paying that per ROW measured slower than the old inline
    * emitters. A non-foldable operand stages per row into a reused
    * scratch field ([[stageInto]]). */
  private def stageOperand(ctx: CodegenContext, v: String,
      expr: Option[Expression]): (String, String) = expr match {
    case Some(e) if e.foldable =>
      val arr = e.eval(null) match {
        case null => null
        case a: ArrayData => a.toFloatArray
      }
      ("", ctx.addReferenceObj("constVec", arr, "float[]"))
    case _ =>
      val x = ctx.freshName("stagedVec")
      val scratch = ctx.addMutableState("float[]", "vecScratch")
      val k = "graft.functions.VectorKernels$.MODULE$"
      (s"float[] $x = $k.stageInto($v, $scratch); $scratch = $x;\n", x)
  }

  private def staged2(ctx: CodegenContext, a: String, b: String,
      method: String, left: Option[Expression],
      right: Option[Expression]): Snippet = {
    val (ca, xa) = stageOperand(ctx, a, left)
    val (cb, yb) = stageOperand(ctx, b, right)
    val out = ctx.freshName("out")
    val k = "graft.functions.VectorKernels$.MODULE$"
    Snippet(s"$ca$cb double $out = $k.$method($xa, $yb);", out)
  }

  /** Codegen emitter for the squared-L2 kernel: stage both operands to
    * primitive float[] (constant-hoisted when foldable, bulk-copied
    * per row otherwise), call [[l2sqBest]]. */
  def l2sqLanesCode(ctx: CodegenContext, a: String, b: String,
      left: Option[Expression] = None,
      right: Option[Expression] = None): Snippet =
    staged2(ctx, a, b, "l2sqBest", left, right)

  /** Codegen emitter for the dot kernel — the twin of [[dot]]. */
  def dotLanesCode(ctx: CodegenContext, a: String, b: String,
      left: Option[Expression] = None,
      right: Option[Expression] = None): Snippet =
    staged2(ctx, a, b, "dotBest", left, right)

  /** Codegen emitter for the full cosine (zero-norm rule inside) —
    * the twin of [[cosineParts]] + the guard. */
  def cosineLanesCode(ctx: CodegenContext, a: String, b: String,
      left: Option[Expression] = None,
      right: Option[Expression] = None): Snippet =
    staged2(ctx, a, b, "cosineBest", left, right)

  /** Codegen emitter for ‖x‖² — the twin of [[normSq]]. */
  def normSqLanesCode(ctx: CodegenContext, a: String,
      child: Option[Expression] = None): Snippet = {
    val (c, xa) = stageOperand(ctx, a, child)
    val out = ctx.freshName("out")
    val k = "graft.functions.VectorKernels$.MODULE$"
    Snippet(s"$c double $out = $k.normSqBest($xa);", out)
  }
}

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

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = VectorKernels.l2sqLanesCode(ctx, a, b, Some(left), Some(right))
      s"""
         |${s.code}
         |${ev.value} = ${s.value};
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

  override def nullSafeEval(a: Any, b: Any): Any =
    math.sqrt(VectorKernels.l2sq(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = VectorKernels.l2sqLanesCode(ctx, a, b, Some(left), Some(right))
      s"""
         |${s.code}
         |${ev.value} = java.lang.Math.sqrt(${s.value});
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

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = VectorKernels.dotLanesCode(ctx, a, b, Some(left), Some(right))
      s"""
         |${s.code}
         |${ev.value} = ${s.value};
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
    val (dot, na, nb) = VectorKernels.cosineParts(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = VectorKernels.cosineLanesCode(ctx, a, b, Some(left), Some(right))
      s"""
         |${s.code}
         |${ev.value} = ${s.value};
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

  override def nullSafeEval(a: Any): Any =
    math.sqrt(VectorKernels.normSq(a.asInstanceOf[ArrayData]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = VectorKernels.normSqLanesCode(ctx, a, Some(child))
      s"""
         |${s.code}
         |${ev.value} = java.lang.Math.sqrt(${s.value});
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

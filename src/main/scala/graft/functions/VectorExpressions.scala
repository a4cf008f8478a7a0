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

  /** Codegen emitter for the lane-4 squared-L2 sum over two ArrayData
    * locals — the exact Java twin of [[l2sq]]. */
  def l2sqLanesCode(ctx: CodegenContext, a: String, b: String): Snippet = {
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val n4 = ctx.freshName("n4")
    val s0 = ctx.freshName("s0"); val s1 = ctx.freshName("s1")
    val s2 = ctx.freshName("s2"); val s3 = ctx.freshName("s3")
    val d0 = ctx.freshName("d0"); val d1 = ctx.freshName("d1")
    val d2 = ctx.freshName("d2"); val d3 = ctx.freshName("d3")
    val d = ctx.freshName("d"); val out = ctx.freshName("out")
    val code =
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s0 = 0.0; double $s1 = 0.0; double $s2 = 0.0; double $s3 = 0.0;
         |int $n4 = $n - ($n & 3);
         |int $i = 0;
         |for (; $i < $n4; $i += 4) {
         |  double $d0 = (double)$a.getFloat($i) - (double)$b.getFloat($i);
         |  double $d1 = (double)$a.getFloat($i + 1) - (double)$b.getFloat($i + 1);
         |  double $d2 = (double)$a.getFloat($i + 2) - (double)$b.getFloat($i + 2);
         |  double $d3 = (double)$a.getFloat($i + 3) - (double)$b.getFloat($i + 3);
         |  $s0 += $d0 * $d0; $s1 += $d1 * $d1; $s2 += $d2 * $d2; $s3 += $d3 * $d3;
         |}
         |if ($i < $n) { double $d = (double)$a.getFloat($i) - (double)$b.getFloat($i); $s0 += $d * $d; $i++; }
         |if ($i < $n) { double $d = (double)$a.getFloat($i) - (double)$b.getFloat($i); $s1 += $d * $d; $i++; }
         |if ($i < $n) { double $d = (double)$a.getFloat($i) - (double)$b.getFloat($i); $s2 += $d * $d; }
         |double $out = ($s0 + $s1) + ($s2 + $s3);
       """.stripMargin
    Snippet(code, out)
  }

  /** Codegen emitter for the lane-4 dot product — the twin of [[dot]]. */
  def dotLanesCode(ctx: CodegenContext, a: String, b: String): Snippet = {
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val n4 = ctx.freshName("n4")
    val s0 = ctx.freshName("s0"); val s1 = ctx.freshName("s1")
    val s2 = ctx.freshName("s2"); val s3 = ctx.freshName("s3")
    val out = ctx.freshName("out")
    val code =
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s0 = 0.0; double $s1 = 0.0; double $s2 = 0.0; double $s3 = 0.0;
         |int $n4 = $n - ($n & 3);
         |int $i = 0;
         |for (; $i < $n4; $i += 4) {
         |  $s0 += (double)$a.getFloat($i) * (double)$b.getFloat($i);
         |  $s1 += (double)$a.getFloat($i + 1) * (double)$b.getFloat($i + 1);
         |  $s2 += (double)$a.getFloat($i + 2) * (double)$b.getFloat($i + 2);
         |  $s3 += (double)$a.getFloat($i + 3) * (double)$b.getFloat($i + 3);
         |}
         |if ($i < $n) { $s0 += (double)$a.getFloat($i) * (double)$b.getFloat($i); $i++; }
         |if ($i < $n) { $s1 += (double)$a.getFloat($i) * (double)$b.getFloat($i); $i++; }
         |if ($i < $n) { $s2 += (double)$a.getFloat($i) * (double)$b.getFloat($i); }
         |double $out = ($s0 + $s1) + ($s2 + $s3);
       """.stripMargin
    Snippet(code, out)
  }

  /** Codegen emitter for the three cosine sums — the twin of
    * [[cosineParts]]; values are (dot, normA, normB). */
  def cosineLanesCode(ctx: CodegenContext, a: String, b: String)
      : (String, String, String, String) = {
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val n4 = ctx.freshName("n4")
    val xa = ctx.freshName("xa"); val yb = ctx.freshName("yb")
    val ds = (0 to 3).map(j => ctx.freshName(s"dd$j"))
    val as = (0 to 3).map(j => ctx.freshName(s"na$j"))
    val bs = (0 to 3).map(j => ctx.freshName(s"nb$j"))
    val dd = ctx.freshName("dd"); val na = ctx.freshName("na")
    val nb = ctx.freshName("nb")
    def lane(j: Int, idx: String) =
      s"""double $xa$j = (double)$a.getFloat($idx); double $yb$j = (double)$b.getFloat($idx);
         |  ${ds(j)} += $xa$j * $yb$j; ${as(j)} += $xa$j * $xa$j; ${bs(j)} += $yb$j * $yb$j;""".stripMargin
    val code =
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ds(0)} = 0.0, ${ds(1)} = 0.0, ${ds(2)} = 0.0, ${ds(3)} = 0.0;
         |double ${as(0)} = 0.0, ${as(1)} = 0.0, ${as(2)} = 0.0, ${as(3)} = 0.0;
         |double ${bs(0)} = 0.0, ${bs(1)} = 0.0, ${bs(2)} = 0.0, ${bs(3)} = 0.0;
         |int $n4 = $n - ($n & 3);
         |int $i = 0;
         |for (; $i < $n4; $i += 4) {
         |  ${lane(0, s"$i")}
         |  ${lane(1, s"$i + 1")}
         |  ${lane(2, s"$i + 2")}
         |  ${lane(3, s"$i + 3")}
         |}
         |if ($i < $n) { ${lane(0, s"$i")} $i++; }
         |if ($i < $n) { ${lane(1, s"$i")} $i++; }
         |if ($i < $n) { ${lane(2, s"$i")} }
         |double $dd = (${ds(0)} + ${ds(1)}) + (${ds(2)} + ${ds(3)});
         |double $na = (${as(0)} + ${as(1)}) + (${as(2)} + ${as(3)});
         |double $nb = (${bs(0)} + ${bs(1)}) + (${bs(2)} + ${bs(3)});
       """.stripMargin
    (code, dd, na, nb)
  }

  /** Codegen emitter for the lane-4 self dot (‖x‖²) — the twin of
    * [[normSq]]. */
  def normSqLanesCode(ctx: CodegenContext, a: String): Snippet = {
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val n4 = ctx.freshName("n4")
    val s0 = ctx.freshName("s0"); val s1 = ctx.freshName("s1")
    val s2 = ctx.freshName("s2"); val s3 = ctx.freshName("s3")
    val v = ctx.freshName("v"); val out = ctx.freshName("out")
    val code =
      s"""
         |int $n = $a.numElements();
         |double $s0 = 0.0; double $s1 = 0.0; double $s2 = 0.0; double $s3 = 0.0;
         |int $n4 = $n - ($n & 3);
         |int $i = 0;
         |for (; $i < $n4; $i += 4) {
         |  double ${v}0 = (double)$a.getFloat($i);
         |  double ${v}1 = (double)$a.getFloat($i + 1);
         |  double ${v}2 = (double)$a.getFloat($i + 2);
         |  double ${v}3 = (double)$a.getFloat($i + 3);
         |  $s0 += ${v}0 * ${v}0; $s1 += ${v}1 * ${v}1;
         |  $s2 += ${v}2 * ${v}2; $s3 += ${v}3 * ${v}3;
         |}
         |if ($i < $n) { double ${v}t = (double)$a.getFloat($i); $s0 += ${v}t * ${v}t; $i++; }
         |if ($i < $n) { double ${v}t = (double)$a.getFloat($i); $s1 += ${v}t * ${v}t; $i++; }
         |if ($i < $n) { double ${v}t = (double)$a.getFloat($i); $s2 += ${v}t * ${v}t; }
         |double $out = ($s0 + $s1) + ($s2 + $s3);
       """.stripMargin
    Snippet(code, out)
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
      val s = VectorKernels.l2sqLanesCode(ctx, a, b)
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
      val s = VectorKernels.l2sqLanesCode(ctx, a, b)
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
      val s = VectorKernels.dotLanesCode(ctx, a, b)
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
      val (code, dot, na, nb) = VectorKernels.cosineLanesCode(ctx, a, b)
      s"""
         |$code
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

  override def nullSafeEval(a: Any): Any =
    math.sqrt(VectorKernels.normSq(a.asInstanceOf[ArrayData]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = VectorKernels.normSqLanesCode(ctx, a)
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

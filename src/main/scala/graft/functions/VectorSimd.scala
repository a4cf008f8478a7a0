package graft.functions

import jdk.incubator.vector.{DoubleVector, FloatVector, VectorOperators}

/** SIMD implementations of the lane-4 kernels via the JDK Vector API —
  * the apples-to-apples twin of the reference's AVX2 kernel
  * (/root/reference/src/distance.cpp:6-43: 256-bit FMA lanes over an
  * in-RAM batch).
  *
  * BIT-IDENTICAL to [[VectorKernels]] by construction, not by luck: the
  * 256-bit double species holds exactly 4 lanes, so vector lane k
  * accumulates elements i ≡ k (mod 4) in ascending i — precisely the
  * LANE-4 FOLD CONTRACT (VectorExpressions.scala header) — and every
  * per-lane vcvtps2pd/vsubpd/vmulpd/vaddpd is the same IEEE double op
  * the scalar kernel runs (float→double conversion is always exact; no
  * FMA contraction — the reference fuses, we don't, because the scalar
  * twin and the SQL oracle can't). Lanes extract and combine in the
  * contracted (s0 + s1) + (s2 + s3) order; the ragged tail runs the
  * scalar contract. A spec cross-checks all three paths bit-for-bit.
  *
  * Used by the serving-path float[] call sites and the kernel
  * micro-bench; the scan path stays on the codegen'd scalar twin
  * (generated Java can't reach the incubator module), which is why the
  * bench reports both numbers. */
object VectorSimd {

  private val DS = DoubleVector.SPECIES_256
  private val FS = FloatVector.SPECIES_128

  /** True once the species proved usable on this JVM (module present,
    * shapes supported) — callers fall back to the scalar twin when not. */
  val available: Boolean =
    try { DoubleVector.zero(DS); true } catch { case _: Throwable => false }

  def l2sqV(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    val n4 = n - (n & 3)
    var acc = DoubleVector.zero(DS)
    var i = 0
    while (i < n4) {
      val va = FloatVector.fromArray(FS, a, i)
        .convertShape(VectorOperators.F2D, DS, 0).asInstanceOf[DoubleVector]
      val vb = FloatVector.fromArray(FS, b, i)
        .convertShape(VectorOperators.F2D, DS, 0).asInstanceOf[DoubleVector]
      val d = va.sub(vb)
      acc = acc.add(d.mul(d))
      i += 4
    }
    var s0 = acc.lane(0); var s1 = acc.lane(1); var s2 = acc.lane(2)
    val s3 = acc.lane(3)
    if (i < n) { val d = a(i).toDouble - b(i).toDouble; s0 += d * d; i += 1 }
    if (i < n) { val d = a(i).toDouble - b(i).toDouble; s1 += d * d; i += 1 }
    if (i < n) { val d = a(i).toDouble - b(i).toDouble; s2 += d * d }
    (s0 + s1) + (s2 + s3)
  }

  def dotV(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    val n4 = n - (n & 3)
    var acc = DoubleVector.zero(DS)
    var i = 0
    while (i < n4) {
      val va = FloatVector.fromArray(FS, a, i)
        .convertShape(VectorOperators.F2D, DS, 0).asInstanceOf[DoubleVector]
      val vb = FloatVector.fromArray(FS, b, i)
        .convertShape(VectorOperators.F2D, DS, 0).asInstanceOf[DoubleVector]
      acc = acc.add(va.mul(vb))
      i += 4
    }
    var s0 = acc.lane(0); var s1 = acc.lane(1); var s2 = acc.lane(2)
    val s3 = acc.lane(3)
    if (i < n) { s0 += a(i).toDouble * b(i).toDouble; i += 1 }
    if (i < n) { s1 += a(i).toDouble * b(i).toDouble; i += 1 }
    if (i < n) { s2 += a(i).toDouble * b(i).toDouble }
    (s0 + s1) + (s2 + s3)
  }

  def cosineV(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    val n4 = n - (n & 3)
    var dAcc = DoubleVector.zero(DS)
    var aAcc = DoubleVector.zero(DS)
    var bAcc = DoubleVector.zero(DS)
    var i = 0
    while (i < n4) {
      val va = FloatVector.fromArray(FS, a, i)
        .convertShape(VectorOperators.F2D, DS, 0).asInstanceOf[DoubleVector]
      val vb = FloatVector.fromArray(FS, b, i)
        .convertShape(VectorOperators.F2D, DS, 0).asInstanceOf[DoubleVector]
      dAcc = dAcc.add(va.mul(vb))
      aAcc = aAcc.add(va.mul(va))
      bAcc = bAcc.add(vb.mul(vb))
      i += 4
    }
    var d0 = dAcc.lane(0); var d1 = dAcc.lane(1); var d2 = dAcc.lane(2)
    val d3 = dAcc.lane(3)
    var a0 = aAcc.lane(0); var a1 = aAcc.lane(1); var a2 = aAcc.lane(2)
    val a3 = aAcc.lane(3)
    var b0 = bAcc.lane(0); var b1 = bAcc.lane(1); var b2 = bAcc.lane(2)
    val b3 = bAcc.lane(3)
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
}

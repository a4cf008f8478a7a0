package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{VectorKernels, VectorSimd}

/** The LANE-4 FOLD CONTRACT's three implementations must agree bit for
  * bit on every input shape: the interpreted ArrayData kernels (also
  * the template the codegen emitters mirror), the float[] twins the
  * serving path and kernel bench run, and the SIMD twins (JDK Vector
  * API). Ragged dims exercise every tail-lane combination; the fixed
  * probe vector plus random data exercise real magnitudes. */
class VectorKernelsSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(7)
  private def vec(n: Int): Array[Float] = Array.fill(n)(rnd.nextFloat() * 2 - 1)
  private def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)

  private val dims = Seq(1, 2, 3, 4, 5, 7, 8, 15, 16, 63, 64, 65)

  test("simd == scalar float[] twin == ArrayData kernel, all tail shapes") {
    assert(VectorSimd.available, "Vector API species unavailable")
    for (n <- dims; _ <- 1 to 20) {
      val a = vec(n); val b = vec(n)
      val ad = new GenericArrayData(a.map(x => x: Any))
      val bd = new GenericArrayData(b.map(x => x: Any))

      assert(bits(VectorKernels.l2sqF(a, b)) == bits(VectorSimd.l2sqV(a, b)),
        s"l2sq simd/scalar drift at dim $n")
      assert(bits(VectorKernels.l2sqF(a, b)) == bits(VectorKernels.l2sq(ad, bd)),
        s"l2sq float[]/ArrayData drift at dim $n")

      assert(bits(VectorKernels.dotF(a, b)) == bits(VectorSimd.dotV(a, b)),
        s"dot simd/scalar drift at dim $n")
      assert(bits(VectorKernels.dotF(a, b)) == bits(VectorKernels.dot(ad, bd)),
        s"dot float[]/ArrayData drift at dim $n")

      assert(bits(VectorKernels.cosineF(a, b)) == bits(VectorSimd.cosineV(a, b)),
        s"cosine simd/scalar drift at dim $n")
      val (cd, cna, cnb) = VectorKernels.cosineParts(ad, bd)
      val cref = if (cna == 0.0 || cnb == 0.0) 0.0
        else cd / (math.sqrt(cna) * math.sqrt(cnb))
      assert(bits(VectorKernels.cosineF(a, b)) == bits(cref),
        s"cosine float[]/ArrayData drift at dim $n")
    }
  }

  test("zero-norm cosine convention survives all three paths") {
    val z = Array.fill(8)(0f); val v = vec(8)
    assert(VectorKernels.cosineF(z, v) == 0.0)
    assert(VectorSimd.cosineV(z, v) == 0.0)
    assert(VectorSimd.cosineV(v, z) == 0.0)
  }

  test("lane law: dim-5 l2sq equals hand-computed lane sums") {
    val a = Array(1f, 2f, 3f, 4f, 5f)
    val b = Array(0f, 0f, 0f, 0f, 0f)
    // lanes: s0 = 1 + 25 (i=0 and the i=4 tail), s1 = 4, s2 = 9, s3 = 16
    val want = ((1.0 + 25.0) + 4.0) + (9.0 + 16.0)
    assert(VectorKernels.l2sqF(a, b) == want)
    assert(VectorSimd.l2sqV(a, b) == want)
  }
}

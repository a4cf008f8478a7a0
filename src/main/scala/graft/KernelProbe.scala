package graft

/** Scratch diagnostic: time the sequential vs lane-4 L2 kernels with
  * monomorphic call sites, outside the bench harness. Not part of the
  * contract. */
object KernelProbe {

  private def l2seq(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
    s
  }

  private def l2lane2(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var s0 = 0.0; var s1 = 0.0
    var i = 0
    while (i + 1 < n) {
      val d0 = a(i).toDouble - b(i).toDouble
      val d1 = a(i + 1).toDouble - b(i + 1).toDouble
      s0 += d0 * d0; s1 += d1 * d1
      i += 2
    }
    if (i < n) { val d = a(i).toDouble - b(i).toDouble; s0 += d * d }
    s0 + s1
  }

  private def l2lane4b(a: Array[Float], b: Array[Float]): Double = {
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

  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(42)
    val vecs = Array.fill(4096)(Array.fill(64)(rnd.nextFloat()))
    val probe = Array.fill(64)(0.5f)
    var sink = 0.0
    def timeSeq(evals: Long): Double = {
      val t0 = System.nanoTime()
      var e = 0L
      while (e < evals) {
        sink += l2seq(vecs((e % 4096).toInt), probe); e += 1
      }
      evals / ((System.nanoTime() - t0) / 1e9) / 1e6
    }
    def timeLane(evals: Long): Double = {
      val t0 = System.nanoTime()
      var e = 0L
      while (e < evals) {
        sink += graft.functions.VectorKernels.l2sqF(vecs((e % 4096).toInt), probe)
        e += 1
      }
      evals / ((System.nanoTime() - t0) / 1e9) / 1e6
    }
    def timeL2(evals: Long): Double = {
      val t0 = System.nanoTime()
      var e = 0L
      while (e < evals) {
        sink += l2lane2(vecs((e % 4096).toInt), probe); e += 1
      }
      evals / ((System.nanoTime() - t0) / 1e9) / 1e6
    }
    def timeL4b(evals: Long): Double = {
      val t0 = System.nanoTime()
      var e = 0L
      while (e < evals) {
        sink += l2lane4b(vecs((e % 4096).toInt), probe); e += 1
      }
      evals / ((System.nanoTime() - t0) / 1e9) / 1e6
    }
    def timeSimd(evals: Long): Double = {
      val t0 = System.nanoTime()
      var e = 0L
      while (e < evals) {
        sink += graft.functions.VectorSimd.l2sqV(vecs((e % 4096).toInt), probe)
        e += 1
      }
      evals / ((System.nanoTime() - t0) / 1e9) / 1e6
    }
    // cross-check: simd == shared scalar kernel, bit for bit
    var k = 0
    while (k < 4096) {
      val s = graft.functions.VectorKernels.l2sqF(vecs(k), probe)
      val v = graft.functions.VectorSimd.l2sqV(vecs(k), probe)
      require(java.lang.Double.doubleToLongBits(s) ==
        java.lang.Double.doubleToLongBits(v), s"simd mismatch at $k: $s vs $v")
      k += 1
    }
    timeL4b(2000000L); timeSeq(2000000L); timeSimd(2000000L)
    println(f"lane4b ${timeL4b(20000000L)}%.2f Meval/s")
    println(f"seq    ${timeSeq(20000000L)}%.2f Meval/s")
    println(f"simd   ${timeSimd(60000000L)}%.2f Meval/s")
    println(f"lane4b ${timeL4b(20000000L)}%.2f Meval/s (2nd)")
    println(f"seq    ${timeSeq(20000000L)}%.2f Meval/s (2nd)")
    println(f"simd   ${timeSimd(60000000L)}%.2f Meval/s (2nd)")
    require(!sink.isNaN)
  }
}

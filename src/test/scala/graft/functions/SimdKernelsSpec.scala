package graft.functions

import graft.simd.{LaneSplitScalarVecOps, ScalarVecOps, VecOps}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the SIMD vector kernels ([[graft.simd.PanamaVecOps]]) BIT-IDENTICAL
  * to their scalar lane-split-8 reference — the property that lets the
  * per-JVM provider swap freely under every cosine route without breaking
  * the cross-route equality specs. The equality is provable (float→double
  * products are exact, so FMA == mul-then-add), and this spec checks the
  * proof holds on the real hardware: random vectors, ragged tails (every
  * length mod 8), negatives, zeros, subnormals, huge/tiny magnitudes.
  *
  * Also pins the per-implementation invariant the kernels rely on: fused
  * `dotNorms` equals the standalone `dot`/`normSq` calls bitwise (the
  * packed block kernels stage norms at decode time while `cosine_sim`
  * fuses — both must see the same doubles).
  */
class SimdKernelsSpec extends AnyFunSuite {

  private val reference = new LaneSplitScalarVecOps
  private val serial = new ScalarVecOps

  private def randomVec(rnd: java.util.Random, n: Int): Array[Float] = {
    val v = new Array[Float](n)
    var i = 0
    while (i < n) {
      v(i) = rnd.nextInt(6) match {
        case 0 => 0f
        case 1 => java.lang.Float.MIN_VALUE * (rnd.nextInt(100) + 1) // subnormal
        case 2 => (rnd.nextFloat() - 0.5f) * 1e30f
        case 3 => (rnd.nextFloat() - 0.5f) * 1e-30f
        case _ => rnd.nextFloat() - 0.5f
      }
      i += 1
    }
    v
  }

  private def assertBitwise(a: Double, b: Double, what: String): Unit =
    assert(java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b),
      s"$what: $a vs $b")

  test("the SIMD kernel loads on this box (the bench numbers depend on it)") {
    val simd = VecKernels.tryLoadSimd()
    assert(simd.isDefined, "PanamaVecOps failed to load — check --add-modules wiring")
    assert(VecKernels.simdActive, "VecKernels chose the scalar kernel under mode=auto")
  }

  test("SIMD dot/normSq/dotNorms are bit-identical to the lane-split-8 scalar reference") {
    val simd = VecKernels.tryLoadSimd().get
    val rnd = new java.util.Random(20260816L)
    val out1 = new Array[Double](3)
    val out2 = new Array[Double](3)
    for (trial <- 0 until 300) {
      val n = if (trial < 40) trial else 1 + rnd.nextInt(1024) // every tail length, then random
      val a = randomVec(rnd, n)
      val b = randomVec(rnd, n)
      assertBitwise(simd.dot(a, 0, b, 0, n), reference.dot(a, 0, b, 0, n), s"dot n=$n")
      assertBitwise(simd.normSq(a, 0, n), reference.normSq(a, 0, n), s"normSq n=$n")
      simd.dotNorms(a, 0, b, 0, n, out1)
      reference.dotNorms(a, 0, b, 0, n, out2)
      for (j <- 0 until 3) assertBitwise(out1(j), out2(j), s"dotNorms[$j] n=$n")
      // offset forms (the packed kernels address into one contiguous buffer)
      if (n >= 8) {
        val off = rnd.nextInt(4)
        val m = n - off
        assertBitwise(simd.dot(a, off, b, off, m), reference.dot(a, off, b, off, m),
          s"dot off=$off m=$m")
        assertBitwise(simd.normSq(a, off, m), reference.normSq(a, off, m),
          s"normSq off=$off m=$m")
      }
    }
  }

  test("fused dotNorms equals standalone dot/normSq bitwise, in every implementation") {
    val impls: Seq[VecOps] =
      Seq(serial, reference) ++ VecKernels.tryLoadSimd().toSeq
    val rnd = new java.util.Random(7L)
    val out = new Array[Double](3)
    for (impl <- impls; trial <- 0 until 60) {
      val n = 1 + rnd.nextInt(300)
      val a = randomVec(rnd, n)
      val b = randomVec(rnd, n)
      impl.dotNorms(a, 0, b, 0, n, out)
      assertBitwise(out(0), impl.dot(a, 0, b, 0, n), s"${impl.name} fused dot n=$n")
      assertBitwise(out(1), impl.normSq(a, 0, n), s"${impl.name} fused normA n=$n")
      assertBitwise(out(2), impl.normSq(b, 0, n), s"${impl.name} fused normB n=$n")
    }
  }

  test("int8 dot/dotNorms: SIMD equals scalar exactly (integer adds are order-free)") {
    val simd = VecKernels.tryLoadSimd().get
    val rnd = new java.util.Random(99L)
    val out1 = new Array[Long](3)
    val out2 = new Array[Long](3)
    for (trial <- 0 until 200) {
      val n = if (trial < 36) trial else 1 + rnd.nextInt(2048) // every tail mod 16, then random
      val a = new Array[Byte](n); rnd.nextBytes(a) // full range incl. -128
      val b = new Array[Byte](n); rnd.nextBytes(b)
      assert(simd.dotI8(a, 0, b, 0, n) == serial.dotI8(a, 0, b, 0, n), s"dotI8 n=$n")
      simd.dotNormsI8(a, 0, b, 0, n, out1)
      serial.dotNormsI8(a, 0, b, 0, n, out2)
      assert(out1.toSeq == out2.toSeq, s"dotNormsI8 n=$n")
      if (n >= 16) {
        val off = rnd.nextInt(8)
        val m = n - off
        assert(simd.dotI8(a, off, b, off, m) == serial.dotI8(a, off, b, off, m),
          s"dotI8 off=$off m=$m")
      }
    }
    // extremes: all -128 (largest per-element product, 16384)
    val lo = Array.fill[Byte](257)(-128)
    assert(simd.dotI8(lo, 0, lo, 0, 257) == 257L * 16384)
  }

  test("int8 overflow guard: worst-case totals straddling the int boundary are exact") {
    // reduceLanesToLong(ADD) sums the 16 int lanes IN INT before widening,
    // so the TOTAL must fit an int: all-(-128) inputs make every product
    // 2^14, and m = 2^17 puts the total at exactly 2^31 — one past
    // Int.MaxValue. The guard must route that to the long-scalar path;
    // m = 2^17 - 1 (total 2^31 - 2^14) must stay SIMD-safe.
    val simd = VecKernels.tryLoadSimd().get
    val out1 = new Array[Long](3)
    val out2 = new Array[Long](3)
    for (m <- Seq((1 << 17) - 17, (1 << 17) - 1, 1 << 17, (1 << 17) + 5)) {
      val v = Array.fill[Byte](m)(-128)
      val expect = m.toLong * 16384L
      assert(simd.dotI8(v, 0, v, 0, m) == expect, s"dotI8 all -128 m=$m")
      assert(serial.dotI8(v, 0, v, 0, m) == expect, s"serial dotI8 all -128 m=$m")
      simd.dotNormsI8(v, 0, v, 0, m, out1)
      serial.dotNormsI8(v, 0, v, 0, m, out2)
      assert(out1.toSeq == Seq(expect, expect, expect), s"dotNormsI8 simd m=$m")
      assert(out2.toSeq == Seq(expect, expect, expect), s"dotNormsI8 serial m=$m")
    }
    // mixed-sign long vector: random bytes at a guard-exceeding length
    // agree across kernels (the pre-fix repro shape from ADVICE)
    val rnd = new java.util.Random(4242L)
    val n = 200000
    val a = new Array[Byte](n); rnd.nextBytes(a)
    val b = new Array[Byte](n); rnd.nextBytes(b)
    assert(simd.dotI8(a, 0, b, 0, n) == serial.dotI8(a, 0, b, 0, n), "dotI8 n=200000")
  }

  test("quantizeI8 static matches the quantize_i8 expression math on edge shapes") {
    // all-zero → all-zero bytes (maxAbs == 0 branch)
    assert(VecKernels.quantizeI8(Array(0f, 0f, 0f), 0, 3).toSeq == Seq[Byte](0, 0, 0))
    // max element maps to ±127; clamp holds
    val v = Array(-1f, 0.5f, 1f)
    val q = VecKernels.quantizeI8(v, 0, 3)
    assert(q(0) == -127 && q(2) == 127 && math.abs(q(1) - 64) <= 1)
    // offset slicing sees only the window
    val w = Array(100f, 1f, -1f, 100f)
    assert(VecKernels.quantizeI8(w, 1, 2).toSeq == Seq[Byte](127, -127))
  }

  test("cosineFF semantics: min-length prefix, 0.0 on zero norms, empty arrays") {
    assert(VecKernels.cosineFF(Array.empty[Float], Array.empty[Float]) == 0.0)
    assert(VecKernels.cosineFF(Array(0f, 0f), Array(1f, 2f)) == 0.0)
    assert(VecKernels.cosineFF(Array(1f, 2f), Array(0f, 0f)) == 0.0)
    // min-length: the longer side's excess elements must not contribute
    val a = Array(1f, 2f, 3f)
    val b = Array(1f, 2f, 3f, 100f)
    assert(math.abs(VecKernels.cosineFF(a, b) - 1.0) < 1e-12)
    // identical vectors → exactly 1.0-ish regardless of provider
    val v = Array.tabulate(64)(i => (i - 32).toFloat / 7f)
    assert(math.abs(VecKernels.cosineFF(v, v) - 1.0) < 1e-12)
  }

  test("graft.simd mode string is normalized and validated") {
    // case/whitespace-insensitive: an 'OFF' typo must not re-enable SIMD
    assert(VecKernels.resolveMode("OFF") == "off")
    assert(VecKernels.resolveMode(" Off ") == "off")
    assert(VecKernels.resolveMode("Scalar") == "scalar")
    assert(VecKernels.resolveMode("AUTO") == "auto")
    // values outside {auto, off, scalar} fail fast with the set named
    val e = intercept[IllegalArgumentException](VecKernels.resolveMode("offf"))
    assert(e.getMessage.contains("auto|off|scalar"))
    assert(intercept[IllegalArgumentException](VecKernels.resolveMode(""))
      .getMessage.contains("auto|off|scalar"))
  }
}

package graft.simd;

import jdk.incubator.vector.ByteVector;
import jdk.incubator.vector.DoubleVector;
import jdk.incubator.vector.FloatVector;
import jdk.incubator.vector.IntVector;
import jdk.incubator.vector.ShortVector;
import jdk.incubator.vector.VectorOperators;
import jdk.incubator.vector.VectorSpecies;

/** Lane-split-8 arithmetic on 512-bit vectors (8 float loads &rarr; 8
 *  double lanes, one FMA per 8 elements). Bit-identical to
 *  {@link LaneSplitScalarVecOps} because the float&rarr;double widened
 *  products are EXACT, so each FMA's single rounding equals the scalar
 *  mul-then-add's single rounding, and the lane/combine/tail order is the
 *  same by construction (spec-pinned in SimdKernelsSpec).
 *
 *  <p>Only this class touches {@code jdk.incubator.vector}; it is loaded
 *  reflectively by {@code graft.functions.VecKernels} so a JVM without
 *  {@code --add-modules=jdk.incubator.vector} falls back to
 *  {@link ScalarVecOps} instead of dying on class resolution (the
 *  Lucene PanamaVectorizationProvider pattern). Constructed only when
 *  {@code DoubleVector.SPECIES_PREFERRED} is 512-bit: on narrower
 *  hardware the 512-bit species is emulated lane-by-lane and loses to
 *  the plain serial loop. Measured on the 32-thread bench box:
 *  36.9 Gmult/s aggregate vs 18.4 serial (2.0&times;) on a streaming
 *  1 GB corpus — the new ANN scan roof is ~148 GB/s of corpus bytes. */
public final class PanamaVecOps implements VecOps {
  private static final VectorSpecies<Float> FSP = FloatVector.SPECIES_256;
  private static final VectorSpecies<Double> DSP = DoubleVector.SPECIES_512;

  public PanamaVecOps() {
    if (DoubleVector.SPECIES_PREFERRED.vectorBitSize() < 512) {
      throw new UnsupportedOperationException(
          "preferred double species is " + DoubleVector.SPECIES_PREFERRED
              + "; 512-bit lanes would be emulated");
    }
  }

  private static double combine(DoubleVector acc) {
    return ((((((acc.lane(0) + acc.lane(1)) + acc.lane(2)) + acc.lane(3))
        + acc.lane(4)) + acc.lane(5)) + acc.lane(6)) + acc.lane(7);
  }

  @Override
  public double dot(float[] a, int aOff, float[] b, int bOff, int m) {
    DoubleVector acc = DoubleVector.zero(DSP);
    int ub = m & ~7;
    int i = 0;
    for (; i < ub; i += 8) {
      DoubleVector da = (DoubleVector)
          FloatVector.fromArray(FSP, a, aOff + i).convertShape(VectorOperators.F2D, DSP, 0);
      DoubleVector db = (DoubleVector)
          FloatVector.fromArray(FSP, b, bOff + i).convertShape(VectorOperators.F2D, DSP, 0);
      acc = da.fma(db, acc);
    }
    double s = combine(acc);
    for (; i < m; i++) s += (double) a[aOff + i] * (double) b[bOff + i];
    return s;
  }

  @Override
  public double normSq(float[] v, int off, int m) {
    DoubleVector acc = DoubleVector.zero(DSP);
    int ub = m & ~7;
    int i = 0;
    for (; i < ub; i += 8) {
      DoubleVector dv = (DoubleVector)
          FloatVector.fromArray(FSP, v, off + i).convertShape(VectorOperators.F2D, DSP, 0);
      acc = dv.fma(dv, acc);
    }
    double s = combine(acc);
    for (; i < m; i++) { double x = v[off + i]; s += x * x; }
    return s;
  }

  @Override
  public void dotNorms(float[] a, int aOff, float[] b, int bOff, int m, double[] out) {
    DoubleVector dAcc = DoubleVector.zero(DSP);
    DoubleVector aAcc = DoubleVector.zero(DSP);
    DoubleVector bAcc = DoubleVector.zero(DSP);
    int ub = m & ~7;
    int i = 0;
    for (; i < ub; i += 8) {
      DoubleVector da = (DoubleVector)
          FloatVector.fromArray(FSP, a, aOff + i).convertShape(VectorOperators.F2D, DSP, 0);
      DoubleVector db = (DoubleVector)
          FloatVector.fromArray(FSP, b, bOff + i).convertShape(VectorOperators.F2D, DSP, 0);
      dAcc = da.fma(db, dAcc);
      aAcc = da.fma(da, aAcc);
      bAcc = db.fma(db, bAcc);
    }
    double dot = combine(dAcc);
    double na = combine(aAcc);
    double nb = combine(bAcc);
    for (; i < m; i++) {
      double x = a[aOff + i];
      double y = b[bOff + i];
      dot += x * y; na += x * x; nb += y * y;
    }
    out[0] = dot; out[1] = na; out[2] = nb;
  }

  // ---- int8 kernels: 16 bytes -> 16 shorts (products |x·y| <= 16384 fit
  // short) -> widen to 16 int lanes and accumulate. Integer adds are
  // associative, so SIMD == scalar EXACTLY with no reference arithmetic.
  // The binding overflow is NOT the per-lane accumulator: IntVector
  // .reduceLanesToLong(ADD) sums the 16 lanes in int (wrapping) BEFORE
  // widening to long, so the TOTAL |dot| must fit an int. Worst case is
  // all-(-128) inputs (per-element product 2^14), so m*2^14 < 2^31 needs
  // m < 2^17: at m = 2^17-1 the max total is 2^31-2^14 (safe); at
  // m = 2^17 it is exactly 2^31 (wraps). Vector dims never approach
  // 131072, but the guard must be correct anyway — SimdKernelsSpec pins
  // both sides of the boundary.
  private static final VectorSpecies<Byte> BSP = ByteVector.SPECIES_128;
  private static final VectorSpecies<Short> SSP = ShortVector.SPECIES_256;
  private static final VectorSpecies<Integer> ISP = IntVector.SPECIES_512;
  private static final int I8_SAFE_M = 1 << 17;

  @Override
  public long dotI8(byte[] a, int aOff, byte[] b, int bOff, int m) {
    if (m >= I8_SAFE_M) {
      long acc = 0L;
      for (int i = 0; i < m; i++) acc += (long) a[aOff + i] * b[bOff + i];
      return acc;
    }
    IntVector acc = IntVector.zero(ISP);
    int ub = m & ~15;
    int i = 0;
    for (; i < ub; i += 16) {
      ShortVector sa = (ShortVector)
          ByteVector.fromArray(BSP, a, aOff + i).convertShape(VectorOperators.B2S, SSP, 0);
      ShortVector sb = (ShortVector)
          ByteVector.fromArray(BSP, b, bOff + i).convertShape(VectorOperators.B2S, SSP, 0);
      acc = acc.add((IntVector) sa.mul(sb).convertShape(VectorOperators.S2I, ISP, 0));
    }
    long s = acc.reduceLanesToLong(VectorOperators.ADD);
    for (; i < m; i++) s += (long) a[aOff + i] * b[bOff + i];
    return s;
  }

  @Override
  public void dotNormsI8(byte[] a, int aOff, byte[] b, int bOff, int m, long[] out) {
    if (m >= I8_SAFE_M) {
      long dot = 0L, na = 0L, nb = 0L;
      for (int i = 0; i < m; i++) {
        long x = a[aOff + i];
        long y = b[bOff + i];
        dot += x * y; na += x * x; nb += y * y;
      }
      out[0] = dot; out[1] = na; out[2] = nb;
      return;
    }
    IntVector dAcc = IntVector.zero(ISP);
    IntVector aAcc = IntVector.zero(ISP);
    IntVector bAcc = IntVector.zero(ISP);
    int ub = m & ~15;
    int i = 0;
    for (; i < ub; i += 16) {
      ShortVector sa = (ShortVector)
          ByteVector.fromArray(BSP, a, aOff + i).convertShape(VectorOperators.B2S, SSP, 0);
      ShortVector sb = (ShortVector)
          ByteVector.fromArray(BSP, b, bOff + i).convertShape(VectorOperators.B2S, SSP, 0);
      dAcc = dAcc.add((IntVector) sa.mul(sb).convertShape(VectorOperators.S2I, ISP, 0));
      aAcc = aAcc.add((IntVector) sa.mul(sa).convertShape(VectorOperators.S2I, ISP, 0));
      bAcc = bAcc.add((IntVector) sb.mul(sb).convertShape(VectorOperators.S2I, ISP, 0));
    }
    long dot = dAcc.reduceLanesToLong(VectorOperators.ADD);
    long na = aAcc.reduceLanesToLong(VectorOperators.ADD);
    long nb = bAcc.reduceLanesToLong(VectorOperators.ADD);
    for (; i < m; i++) {
      long x = a[aOff + i];
      long y = b[bOff + i];
      dot += x * y; na += x * x; nb += y * y;
    }
    out[0] = dot; out[1] = na; out[2] = nb;
  }

  @Override
  public String name() {
    return "panama-512 (" + FSP + " -> " + DSP + ")";
  }
}

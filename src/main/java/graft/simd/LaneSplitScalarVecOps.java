package graft.simd;

/** The scalar REFERENCE for the lane-split-8 arithmetic: eight double
 *  accumulators (lane L sums terms with index &equiv; L mod 8 over the
 *  8-aligned prefix), combined left-to-right, tail sequential. Exists so
 *  {@code SimdKernelsSpec} can pin {@link PanamaVecOps} bit-identical
 *  without hardware assumptions; it is NOT a production fallback (it
 *  measured 0.5&times; of {@link ScalarVecOps} on the bench box). */
public final class LaneSplitScalarVecOps implements VecOps {

  @Override
  public double dot(float[] a, int aOff, float[] b, int bOff, int m) {
    double a0 = 0, a1 = 0, a2 = 0, a3 = 0, a4 = 0, a5 = 0, a6 = 0, a7 = 0;
    int ub = m & ~7;
    int i = 0;
    for (; i < ub; i += 8) {
      a0 += (double) a[aOff + i]     * (double) b[bOff + i];
      a1 += (double) a[aOff + i + 1] * (double) b[bOff + i + 1];
      a2 += (double) a[aOff + i + 2] * (double) b[bOff + i + 2];
      a3 += (double) a[aOff + i + 3] * (double) b[bOff + i + 3];
      a4 += (double) a[aOff + i + 4] * (double) b[bOff + i + 4];
      a5 += (double) a[aOff + i + 5] * (double) b[bOff + i + 5];
      a6 += (double) a[aOff + i + 6] * (double) b[bOff + i + 6];
      a7 += (double) a[aOff + i + 7] * (double) b[bOff + i + 7];
    }
    double s = ((((((a0 + a1) + a2) + a3) + a4) + a5) + a6) + a7;
    for (; i < m; i++) s += (double) a[aOff + i] * (double) b[bOff + i];
    return s;
  }

  @Override
  public double normSq(float[] v, int off, int m) {
    return dot(v, off, v, off, m);
  }

  @Override
  public void dotNorms(float[] a, int aOff, float[] b, int bOff, int m, double[] out) {
    out[0] = dot(a, aOff, b, bOff, m);
    out[1] = normSq(a, aOff, m);
    out[2] = normSq(b, bOff, m);
  }

  @Override
  public long dotI8(byte[] a, int aOff, byte[] b, int bOff, int m) {
    // integer adds are associative — same value in any order
    long acc = 0L;
    for (int i = 0; i < m; i++) acc += (long) a[aOff + i] * b[bOff + i];
    return acc;
  }

  @Override
  public void dotNormsI8(byte[] a, int aOff, byte[] b, int bOff, int m, long[] out) {
    out[0] = dotI8(a, aOff, b, bOff, m);
    out[1] = dotI8(a, aOff, a, aOff, m);
    out[2] = dotI8(b, bOff, b, bOff, m);
  }

  @Override
  public String name() { return "scalar-lane8-reference"; }
}

package graft.simd;

/** The historical serial arithmetic: one double accumulator per quantity,
 *  additions in index order. Chosen when the Vector API module is absent
 *  (or {@code graft.simd=off}) — it is the fastest non-SIMD form (an
 *  8-way split WITHOUT vector units was measured 0.5&times; of this on
 *  the bench box: more live registers, no ILP win for the convert-bound
 *  loop). */
public final class ScalarVecOps implements VecOps {

  @Override
  public double dot(float[] a, int aOff, float[] b, int bOff, int m) {
    double acc = 0.0;
    for (int i = 0; i < m; i++) acc += (double) a[aOff + i] * (double) b[bOff + i];
    return acc;
  }

  @Override
  public double normSq(float[] v, int off, int m) {
    double acc = 0.0;
    for (int i = 0; i < m; i++) { double x = v[off + i]; acc += x * x; }
    return acc;
  }

  @Override
  public void dotNorms(float[] a, int aOff, float[] b, int bOff, int m, double[] out) {
    double dot = 0.0, na = 0.0, nb = 0.0;
    for (int i = 0; i < m; i++) {
      double x = a[aOff + i];
      double y = b[bOff + i];
      dot += x * y; na += x * x; nb += y * y;
    }
    out[0] = dot; out[1] = na; out[2] = nb;
  }

  @Override
  public long dotI8(byte[] a, int aOff, byte[] b, int bOff, int m) {
    long acc = 0L;
    for (int i = 0; i < m; i++) acc += (long) a[aOff + i] * b[bOff + i];
    return acc;
  }

  @Override
  public void dotNormsI8(byte[] a, int aOff, byte[] b, int bOff, int m, long[] out) {
    long dot = 0L, na = 0L, nb = 0L;
    for (int i = 0; i < m; i++) {
      long x = a[aOff + i];
      long y = b[bOff + i];
      dot += x * y; na += x * x; nb += y * y;
    }
    out[0] = dot; out[1] = na; out[2] = nb;
  }

  @Override
  public String name() { return "scalar-serial"; }
}

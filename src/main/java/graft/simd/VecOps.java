package graft.simd;

/**
 * The float-vector arithmetic kernel behind every cosine/dot hot path
 * (the {@code cosine_sim} expression, the packed ANN block kernels, the
 * IVF centroid scorer). ONE implementation is chosen per JVM at class
 * load of {@code graft.functions.VecKernels} and used by ALL call sites,
 * so scores stay bit-identical across physical routes (flat join vs
 * packed block scan vs replicated probe) regardless of which
 * implementation runs — the cross-route equality specs compare within a
 * JVM, and the DuckDB oracles compare at round(&middot;,4), which both
 * implementations satisfy.
 *
 * <p>Two arithmetic definitions exist (they differ only in the ORDER the
 * double additions happen, i.e. in final ulps):
 * <ul>
 *   <li><b>serial</b> ({@link ScalarVecOps}): {@code acc += a[i]*b[i]}
 *       for i = 0..m-1 — the historical kernel, fastest without SIMD.</li>
 *   <li><b>lane-split-8</b> ({@link PanamaVecOps},
 *       {@link LaneSplitScalarVecOps}): eight accumulators, lane L sums
 *       the terms with index &equiv; L (mod 8) in increasing order over
 *       the 8-aligned prefix, combined left-to-right, then the tail
 *       sequentially. The product of two floats widened to double is
 *       EXACT (24-bit &times; 24-bit &lt; 53-bit mantissa), so a fused
 *       multiply-add accumulates bit-identically to mul-then-add — the
 *       SIMD kernel and its scalar reference are provably equal, which
 *       {@code SimdKernelsSpec} pins on random and adversarial inputs.</li>
 * </ul>
 */
public interface VecOps {
  /** Dot product of a[aOff..aOff+m) and b[bOff..bOff+m), accumulated in
   *  double (each product exact — see class doc). */
  double dot(float[] a, int aOff, float[] b, int bOff, int m);

  /** Sum of squares of v[off..off+m), accumulated in double. */
  double normSq(float[] v, int off, int m);

  /** Fused dot + both norms over the common prefix of length m; writes
   *  {dot, normSqA, normSqB} into out (length &ge; 3). Per-accumulator
   *  summation order is IDENTICAL to the standalone {@link #dot} /
   *  {@link #normSq} calls, so fused and staged callers agree bitwise. */
  void dotNorms(float[] a, int aOff, float[] b, int bOff, int m, double[] out);

  /** Dot product of two int8 vectors accumulated in long. Integer adds
   *  are associative, so every implementation returns the SAME long for
   *  the same inputs (no reference arithmetic needed — the spec just
   *  asserts scalar == SIMD). */
  long dotI8(byte[] a, int aOff, byte[] b, int bOff, int m);

  /** Fused int8 dot + both square norms over the common prefix of length
   *  m; writes {dot, normSqA, normSqB} into out (length &ge; 3). */
  void dotNormsI8(byte[] a, int aOff, byte[] b, int bOff, int m, long[] out);

  /** Implementation tag for the one-time selection log line. */
  String name();
}

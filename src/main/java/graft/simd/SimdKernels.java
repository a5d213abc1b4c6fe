package graft.simd;

import jdk.incubator.vector.ByteVector;
import jdk.incubator.vector.FloatVector;
import jdk.incubator.vector.IntVector;
import jdk.incubator.vector.ShortVector;
import jdk.incubator.vector.VectorOperators;
import jdk.incubator.vector.VectorSpecies;

/**
 * Panama-vector dot-product kernel (SURVEY §4.3's last unexplored lever).
 *
 * Only ever reached through {@link SimdBridge}, which probes for the
 * incubator module at class-init and falls back to a scalar loop when the
 * JVM was launched without {@code --add-modules jdk.incubator.vector} —
 * this class must not be referenced from any other call site, or a bare
 * JVM dies with NoClassDefFoundError instead of degrading.
 *
 * The species is PINNED to 256-bit, not SPECIES_PREFERRED: lane count
 * changes the reassociated summation order, so a heterogeneous cluster
 * (AVX-512 driver, NEON executor) running SPECIES_PREFERRED would produce
 * different low bits for the same pair of rows depending on which executor
 * scanned them — nondeterministic retries, flaky dedup thresholds. The
 * Vector API lowers a 256-bit species onto 128-bit hardware as two ops, so
 * pinning costs nothing on narrow machines and only leaves the 512→256
 * doubling on AVX-512 ones; cross-host determinism is worth more to a
 * cluster engine than that last 2x.
 *
 * Two accumulators hide FMA latency (the loop-carried add is the bound
 * otherwise); the float-lane accumulation reassociates the sum, which is
 * why this kernel backs `graft_dot_simd` and NOT `graft_dot` — the
 * oracle-tier queries pin graft_dot's sequential double fold bit-for-bit
 * against DuckDB (SURVEY §2 determinism rule 5).
 */
public final class SimdKernels {
  private static final VectorSpecies<Float> SP = FloatVector.SPECIES_256;
  private static final int STEP = SP.length();

  private SimdKernels() {}

  /** Reassociated f32 dot product over min(a.length, b.length) elements. */
  public static double dotF32(float[] a, float[] b) {
    int n = Math.min(a.length, b.length);
    FloatVector acc0 = FloatVector.zero(SP);
    FloatVector acc1 = FloatVector.zero(SP);
    int i = 0;
    int unrolled = n - n % (2 * STEP);
    for (; i < unrolled; i += 2 * STEP) {
      acc0 = FloatVector.fromArray(SP, a, i).fma(FloatVector.fromArray(SP, b, i), acc0);
      acc1 = FloatVector.fromArray(SP, a, i + STEP).fma(FloatVector.fromArray(SP, b, i + STEP), acc1);
    }
    int vectored = n - n % STEP;
    for (; i < vectored; i += STEP) {
      acc0 = FloatVector.fromArray(SP, a, i).fma(FloatVector.fromArray(SP, b, i), acc0);
    }
    // Tail accumulates in double so the only f32 rounding is inside the
    // lanes themselves.
    double s = (double) acc0.add(acc1).reduceLanes(VectorOperators.ADD);
    for (; i < n; i++) {
      s += (double) a[i] * (double) b[i];
    }
    return s;
  }

  private static final VectorSpecies<Byte> B128 = ByteVector.SPECIES_128;
  private static final VectorSpecies<Short> S256 = ShortVector.SPECIES_256;
  private static final VectorSpecies<Integer> I256 = IntVector.SPECIES_256;

  /**
   * int8×int8 dot product, EXACT — integer addition is associative, so
   * unlike {@link #dotF32} this is bit-identical to the scalar long fold
   * for any lane order.
   *
   * MEASURED AND REJECTED for the query path (kept only so the ABSimd
   * record stays reproducible — nothing in graft calls this): at every
   * dim it LOSES to the plain byte loop (0.30x at d64, 0.47x at d1024,
   * BASELINE.md r10). Integer accumulation has no FP ordering constraint,
   * so C2 auto-vectorizes graft_dot's scalar fold already, and the
   * explicit widen chain below (B2S → mul → 2×S2I → add; the Vector API
   * exposes no VPMADDUBSW-style fused byte-multiply-accumulate) only adds
   * shuffle-port pressure. The SQ8 scan keeps graft_dot's inline loop.
   *
   * Per 16-byte block: widen b→s (products fit: (-128)·(-128) = 16384 =
   * 2¹⁴ < 2¹⁵), multiply in short, widen the 16 products to two int
   * vectors, add into an int accumulator. Worst case each of the 8 int
   * accumulator slots receives n/8 products of magnitude ≤ 2¹⁴, so the
   * slot is exact while (n/8)·2¹⁴ < 2³¹, i.e. n < 2²⁰ — at n = 2²⁰
   * exactly a slot can reach exactly 2³¹ and wrap, hence the guard below
   * is strict ({@code n < 1<<20}); at or beyond it we take the scalar
   * long fold instead of silently wrapping.
   */
  public static double dotI8(byte[] a, byte[] b) {
    int n = Math.min(a.length, b.length);
    if (n >= (1 << 20)) {
      return scalarI8(a, b, n);
    }
    IntVector acc = IntVector.zero(I256);
    int i = 0;
    int vectored = n - n % B128.length();
    for (; i < vectored; i += B128.length()) {
      ShortVector sa = (ShortVector) ByteVector.fromArray(B128, a, i)
          .convertShape(VectorOperators.B2S, S256, 0);
      ShortVector sb = (ShortVector) ByteVector.fromArray(B128, b, i)
          .convertShape(VectorOperators.B2S, S256, 0);
      ShortVector prod = sa.mul(sb);
      acc = acc.add((IntVector) prod.convertShape(VectorOperators.S2I, I256, 0));
      acc = acc.add((IntVector) prod.convertShape(VectorOperators.S2I, I256, 1));
    }
    long s = acc.reduceLanesToLong(VectorOperators.ADD);
    for (; i < n; i++) {
      s += (long) a[i] * b[i];
    }
    return (double) s;
  }

  private static double scalarI8(byte[] a, byte[] b, int n) {
    long acc = 0L;
    for (int i = 0; i < n; i++) {
      acc += (long) a[i] * b[i];
    }
    return (double) acc;
  }
}

package graft.simd;

import jdk.incubator.vector.FloatVector;
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
}

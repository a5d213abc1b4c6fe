package graft.simd;

/**
 * Runtime gate in front of {@link SimdKernels}: probes once at class-init
 * for the incubator Vector API and degrades to a scalar loop when the JVM
 * was launched without {@code --add-modules jdk.incubator.vector} (e.g. a
 * spark-submit that doesn't carry our build.sbt javaOptions). The probe
 * actually executes a kernel call, not just Class.forName, so a module
 * that resolves but fails to link (version skew) also falls back instead
 * of throwing from an executor's hot loop.
 *
 * The scalar fallback reassociates nothing — it is the same sequential
 * double fold as graft_dot — so `graft_dot_simd` stays VALUE-CLOSE to
 * graft_dot on every JVM, and on module-less JVMs it is bit-identical.
 */
public final class SimdBridge {
  private static final boolean SIMD = probe();

  private SimdBridge() {}

  private static boolean probe() {
    try {
      float[] one = new float[] {1f, 2f, 3f};
      return SimdKernels.dotF32(one, one) == 14.0d;
    } catch (Throwable t) {
      return false;
    }
  }

  /** True when the Panama kernel is live in this JVM (test visibility). */
  public static boolean simdActive() {
    return SIMD;
  }

  public static double dot(float[] a, float[] b) {
    if (SIMD) {
      return SimdKernels.dotF32(a, b);
    }
    return scalarDot(a, b);
  }

  /** The fallback fold, public so SimdSpec can pin fallback ≡ graft_dot
   *  even on a JVM where the Panama path is live. */
  public static double scalarDot(float[] a, float[] b) {
    int n = Math.min(a.length, b.length);
    double acc = 0.0;
    for (int i = 0; i < n; i++) {
      acc += (double) a[i] * (double) b[i];
    }
    return acc;
  }

  /** int8×int8 dot — EXACT under any association (integer arithmetic), so
   *  SIMD and fallback return bit-identical doubles; both match
   *  graft_dot's bothByte long fold. A/B-record only: the explicit kernel
   *  measured SLOWER than the auto-vectorized scalar loop at every dim
   *  (see SimdKernels.dotI8 scaladoc) — no query path calls this. */
  public static double dotI8(byte[] a, byte[] b) {
    if (SIMD) {
      return SimdKernels.dotI8(a, b);
    }
    return scalarDotI8(a, b);
  }

  public static double scalarDotI8(byte[] a, byte[] b) {
    int n = Math.min(a.length, b.length);
    long acc = 0L;
    for (int i = 0; i < n; i++) {
      acc += (long) a[i] * b[i];
    }
    return (double) acc;
  }
}

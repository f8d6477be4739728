package graft.functions

/** Thread-local MessageDigest instances for per-row expression kernels
  * (SimHash16, MinHashSignature): `getInstance` is a JCA provider lookup
  * plus allocation — measurable at per-row frequency in the codegen'd
  * hot path. `digest()` resets the instance after each use, so reuse
  * across rows on the same task thread is safe. */
private[graft] object Digests {
  val md5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
}

package graft.functions

/** md5-derived integer hashes that DuckDB (and any engine with md5 +
  * string ops) reproduces bit-for-bit — the cross-engine counterpart of
  * the fast xxhash64 default used by the sketch aggregates. md5 is the
  * one hash function both engines share (see [[graft.dedup.Dedup]]'s
  * hash families, built on the same trick):
  *
  *  - [[h64]]: first 16 hex digits of md5(s) as the raw 64-bit pattern —
  *    DuckDB `('0x' || substr(md5(s), 1, 16))::UBIGINT`
  *  - [[h60]]: first 15 hex digits as a non-negative long — DuckDB
  *    `('0x' || substr(md5(s), 1, 15))::BIGINT` (60 bits, so signed and
  *    unsigned ordering agree in both engines)
  *
  * ~5-10× slower per row than xxhash64 (digest + string alloc): use the
  * replicable sketch variants when cross-engine auditability of the
  * sketch itself is required; the xxhash64 defaults are the production
  * hot path. MessageDigest is not thread-safe → thread-local instance.
  */
object ReplicableHash {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def h64(s: String): Long = {
    val digest = md.get()
    digest.reset()
    val bytes = digest.digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    v
  }

  def h60(s: String): Long = h64(s) >>> 4

  /** Catalyst value → the string DuckDB's `CAST(x AS VARCHAR)` yields.
    * Longs/ints/strings only — the key types the sketch queries use. */
  def keyString(v: Any): String = v match {
    case u: org.apache.spark.unsafe.types.UTF8String => u.toString
    case other                                       => other.toString
  }
}

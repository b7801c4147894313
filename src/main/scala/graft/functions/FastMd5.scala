package graft.functions

/** Single-block MD5 fast path (RFC 1321, implemented from the published
  * algorithm) for the h24 bucket hashing the DSIR kernels do per bigram.
  *
  * Why: `MessageDigest` pays per-call object traffic (reset, internal
  * buffer copy, digest-array allocation) that dominates when the input is
  * a 10–30 byte text slice hashed billions of times across a corpus. A
  * bigram almost always fits MD5's single 64-byte block (≤ 55 bytes of
  * message + padding + length), where the whole digest is 64 unrolled
  * integer rounds over a 16-int schedule — no allocation at all. Longer
  * inputs fall back to a thread-local `MessageDigest`.
  *
  * Output is the ORACLE-PINNED h24: the first 24 bits of the digest (the
  * JVM twin of `conv(substring(md5(c),1,6),16,10)`), bit-identical to
  * [[MinHashAgg.h24]] — property-tested against it across lengths that
  * cross the single-block boundary.
  */
object FastMd5 {

  // per-round left-rotate amounts (RFC 1321 §3.4)
  private val S: Array[Int] = Array(
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21)

  // K(i) = floor(|sin(i+1)| · 2³²) (RFC 1321 §3.4) — derived, not copied
  private val K: Array[Int] =
    Array.tabulate(64)(i =>
      math.floor(math.abs(math.sin(i + 1.0)) * 4294967296.0).toLong.toInt)

  private val mdPool =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 24 bits of md5(b[off, off+len)) — digest bytes 0..2 big-endian,
    * the h24 bucket value. Allocation-free for len ≤ 55. */
  def h24(b: Array[Byte], off: Int, len: Int): Long = {
    if (len > 55) {
      val md = mdPool.get()
      md.reset()
      md.update(b, off, len)
      val d = md.digest()
      return ((d(0) & 0xffL) << 16) | ((d(1) & 0xffL) << 8) | (d(2) & 0xffL)
    }
    // one padded block: message ‖ 0x80 ‖ zeros ‖ bit-length (LE, fits M14)
    val m0 = new Array[Int](16)
    var i = 0
    while (i < len) {
      m0(i >> 2) |= (b(off + i) & 0xff) << ((i & 3) << 3)
      i += 1
    }
    m0(len >> 2) |= 0x80 << ((len & 3) << 3)
    m0(14) = len << 3
    var a = 0x67452301
    var bb = 0xefcdab89
    var c = 0x98badcfe
    var d = 0x10325476
    var j = 0
    while (j < 64) {
      var f = 0
      var g = 0
      if (j < 16) { f = (bb & c) | (~bb & d); g = j }
      else if (j < 32) { f = (d & bb) | (~d & c); g = (5 * j + 1) & 15 }
      else if (j < 48) { f = bb ^ c ^ d; g = (3 * j + 5) & 15 }
      else { f = c ^ (bb | ~d); g = (7 * j) & 15 }
      val tmp = d
      d = c
      c = bb
      bb = bb + Integer.rotateLeft(a + f + K(j) + m0(g), S(j))
      a = tmp
      j += 1
    }
    // digest byte k of word A is (A >>> 8k) & 0xff (little-endian encode)
    val ra = a + 0x67452301
    ((ra & 0xffL) << 16) | (((ra >>> 8) & 0xffL) << 8) | ((ra >>> 16) & 0xffL)
  }

  /** h24 of a string's UTF-8 bytes (test/convenience twin). */
  def h24(s: String): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    h24(b, 0, b.length)
  }

  /** FIVE independent 24-bit slices of md5(b[off, off+len)) into
    * `out(0..4)` — slice s is digest bytes 3s..3s+2 big-endian, the JVM
    * twin of `conv(substring(md5(c), 1+6s, 6), 16, 10)` ([[graft.Tables
    * .h24Slice]]). One digest carries all five draws; allocation-free for
    * len ≤ 55 like [[h24]] (the bootstrap kernel's per-row hot path).
    *
    * The compression core is DELIBERATELY duplicated from [[h24]] rather
    * than factored: the shared-core shapes either allocate per call (a
    * 4-int tuple) or thread a buffer through [[h24]]'s own hot path, and
    * both copies are independently drift-pinned — h24 property-tested
    * against [[MinHashAgg.h24]], this method against the composed
    * `h24Slice` column form (ScaleOpsSpec's BootWeights bit-identity).
    */
  def h24Slices(b: Array[Byte], off: Int, len: Int, out: Array[Long]): Unit = {
    if (len > 55) {
      val md = mdPool.get()
      md.reset()
      md.update(b, off, len)
      val d = md.digest()
      var s = 0
      while (s < 5) {
        out(s) = ((d(3 * s) & 0xffL) << 16) | ((d(3 * s + 1) & 0xffL) << 8) |
          (d(3 * s + 2) & 0xffL)
        s += 1
      }
      return
    }
    val m0 = new Array[Int](16)
    var i = 0
    while (i < len) {
      m0(i >> 2) |= (b(off + i) & 0xff) << ((i & 3) << 3)
      i += 1
    }
    m0(len >> 2) |= 0x80 << ((len & 3) << 3)
    m0(14) = len << 3
    var a = 0x67452301
    var bb = 0xefcdab89
    var c = 0x98badcfe
    var d = 0x10325476
    var j = 0
    while (j < 64) {
      var f = 0
      var g = 0
      if (j < 16) { f = (bb & c) | (~bb & d); g = j }
      else if (j < 32) { f = (d & bb) | (~d & c); g = (5 * j + 1) & 15 }
      else if (j < 48) { f = bb ^ c ^ d; g = (3 * j + 5) & 15 }
      else { f = c ^ (bb | ~d); g = (7 * j) & 15 }
      val tmp = d
      d = c
      c = bb
      bb = bb + Integer.rotateLeft(a + f + K(j) + m0(g), S(j))
      a = tmp
      j += 1
    }
    val ra = a + 0x67452301
    val rb = bb + 0xefcdab89
    val rc = c + 0x98badcfe
    val rd = d + 0x10325476
    // digest byte k of a word is (word >>> 8k) & 0xff (little-endian
    // encode); slice s composes digest bytes 3s..3s+2 big-endian
    @inline def db(w: Int, k: Int): Long = (w >>> (k << 3)) & 0xffL
    out(0) = (db(ra, 0) << 16) | (db(ra, 1) << 8) | db(ra, 2)
    out(1) = (db(ra, 3) << 16) | (db(rb, 0) << 8) | db(rb, 1)
    out(2) = (db(rb, 2) << 16) | (db(rb, 3) << 8) | db(rc, 0)
    out(3) = (db(rc, 1) << 16) | (db(rc, 2) << 8) | db(rc, 3)
    out(4) = (db(rd, 0) << 16) | (db(rd, 1) << 8) | db(rd, 2)
  }
}

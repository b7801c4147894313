package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** From-scratch DEFLATE (RFC 1951) + zlib (RFC 1950) + gzip (RFC 1952)
  * decoding — the sixth native codec, and the first HUFFMAN one: where FLAC
  * Rice codes are self-delimiting unary/binary, DEFLATE interleaves TWO
  * canonical Huffman alphabets (literal/length and distance) whose code
  * tables are themselves Huffman-compressed in dynamic blocks, over an
  * LZ77 32 KiB back-reference window. This is the codec a 100-TB text
  * pipeline actually meets first: web-crawl text ships gzip-compressed, and
  * decoding it INSIDE the scan (a codegen'd expression, no iterator break)
  * is the difference between one pass and a staging detour.
  *
  * The decoder implements the full RFC 1951 surface:
  *
  *  - LSB-first bit stream; Huffman codes packed MSB-of-code-first
  *    (the spec's one deliberate asymmetry, and the classic misreading);
  *  - STORED blocks (byte-aligned, LEN/NLEN one's-complement verified);
  *  - FIXED blocks (the spec's hardwired 288/32-code tables; the invalid
  *    literal codes 286-287 and distance codes 30-31 rejected explicitly);
  *  - DYNAMIC blocks: 3-bit code-length-code lengths permuted in the
  *    spec's order, the 19-symbol code-length alphabet with repeat ops
  *    16/17/18 (copy-previous with no previous, and run-off-the-end, both
  *    rejected), then canonical table build per RFC 1951 §3.2.2;
  *  - table DISCIPLINE mirroring zlib's: over-subscribed codes always
  *    malformed; incomplete codes malformed for the literal/length and
  *    code-length alphabets, tolerated for distance (real encoders emit
  *    degenerate distance trees for matchless data) where an unmatched
  *    pattern then fails at decode;
  *  - LZ77 copy with overlap semantics (distance < length repeats), a
  *    distance reaching before output start rejected (no preset dictionary);
  *  - a hard output cap so an adversarial "bomb" member cannot allocate
  *    beyond [[GzipDecode.MaxOut]].
  *
  * [[ZlibInflate]] wraps it with CMF/FLG validation (method 8, window ≤ 32K,
  * FCHECK mod-31, FDICT rejected) and a VERIFIED from-scratch Adler-32 —
  * and replaces `java.util.zip.Inflater` inside [[PngDecode]], making the
  * PNG path fully self-implemented (its oracle hash staying identical is
  * the cross-engine proof). [[GzipDecode]] wraps it with the RFC 1952
  * member parse — magic, CM, all four optional header fields (FEXTRA
  * subfield skip, zero-terminated FNAME/FCOMMENT, FHCRC verified as the
  * low 16 bits of the header CRC-32), reserved FLG bits rejected — and a
  * VERIFIED from-scratch CRC-32 + ISIZE trailer. gzip is LOSSLESS, so the
  * decode query emits the md5 of the decoded bytes and the DuckDB oracle
  * computes `md5(text)` directly: a decoder that shortcuts any stage of the
  * Huffman/LZ77 pipeline hash-mismatches on full content, not summaries.
  * Malformed payloads decode to NULL (the C3 error-tolerance contract).
  */
object Inflate {

  private[functions] object Malformed extends RuntimeException("malformed DEFLATE") {
    override def fillInStackTrace(): Throwable = this
  }
  private[functions] def fail(): Nothing = throw Malformed

  /** LSB-first bit reader (RFC 1951 §3.1.1: data elements fill bytes from
    * the least-significant bit), backed by a 64-bit cache refilled a byte
    * at a time — `bits(k)` is a mask+shift instead of k bounds-checked
    * single-bit reads, and `peek9` exposes the next 9 stream bits without
    * consuming them for the table-driven Huffman fast path. */
  private final class BitReader(bytes: Array[Byte], startByte: Int) {
    private var bytePos = startByte // next byte to LOAD into the cache
    private var cache = 0L          // stream bits, LSB first
    private var n = 0               // live bits in cache
    private def fill(): Unit = {
      while (n <= 56 && bytePos < bytes.length) {
        cache |= (bytes(bytePos) & 0xffL) << n
        n += 8
        bytePos += 1
      }
    }
    def bits(k: Int): Int = {
      if (n < k) { fill(); if (n < k) fail() }
      val v = (cache & ((1L << k) - 1)).toInt
      cache >>>= k
      n -= k
      v
    }
    def bit(): Int = bits(1)
    /** Next 9 stream bits WITHOUT consuming (zero-padded near stream end —
      * a table hit longer than the remaining bits fails in consume). */
    def peek9(): Int = {
      if (n < 9) fill()
      (cache & 0x1ff).toInt
    }
    def avail: Int = n
    def consume(k: Int): Unit = {
      if (k > n) fail()
      cache >>>= k
      n -= k
    }
    def align(): Unit = consume(n & 7)
    /** Byte offset of the read cursor; callers align first. */
    def byteOff: Int = bytePos - (n >> 3)
    /** Reposition to an absolute byte offset (stored-block copy skip). */
    def seekByte(i: Int): Unit = { bytePos = i; cache = 0L; n = 0 }
    def ceilByteOff: Int = (((bytePos.toLong << 3) - n + 7L) >>> 3).toInt
  }

  /** Canonical Huffman table (RFC 1951 §3.2.2): symbols sorted by
    * (code length, symbol); decode walks lengths 1..15 accumulating the
    * code MSB-first. Over-subscribed length vectors throw at build;
    * incompleteness is recorded for the caller's per-alphabet policy.
    */
  private final class Huff(lengths: Array[Int], n: Int) {
    val count = new Array[Int](16)
    var i = 0
    while (i < n) {
      val l = lengths(i)
      if (l < 0 || l > 15) fail()
      count(l) += 1
      i += 1
    }
    val nCoded: Int = n - count(0)
    // over-subscription: more codes of some length than the prefix space
    private var left = 1
    val complete: Boolean = {
      var len = 1
      while (len <= 15) {
        left <<= 1
        left -= count(len)
        if (left < 0) fail()
        len += 1
      }
      left == 0
    }
    // symbol table ordered by (length, symbol): offs(l) = first index of length l
    private val offs = new Array[Int](16)
    i = 1
    while (i < 15) { offs(i + 1) = offs(i) + count(i); i += 1 }
    val syms = new Array[Int](math.max(nCoded, 1))
    i = 0
    while (i < n) {
      if (lengths(i) != 0) { syms(offs(lengths(i))) = i; offs(lengths(i)) += 1 }
      i += 1
    }
    // ---- single-level lookup table over the next 9 stream bits (the
    // zlib fast path): the first stream bit is the code's MSB, so a code
    // of length L occupies every table slot whose low L bits equal the
    // BIT-REVERSED code; entry = (sym << 4) | L. Codes longer than 9 bits
    // (and unassigned patterns of incomplete trees) leave 0 → the exact
    // counted walk decides. DEFLATE's hot symbols are ≤ 9 bits (all of
    // the fixed tables; dynamic tables by construction of the length
    // limit heuristics), so the walk is the cold path.
    val table = new Array[Char](512)
    locally {
      // canonical code assignment in (length, symbol) order
      var code = 0
      var len = 1
      var idx = 0
      while (len <= 15) {
        var c = 0
        while (c < count(len)) {
          if (len <= 9) {
            // reverse `code`'s low `len` bits into stream order
            var rev = 0
            var b = 0
            while (b < len) { rev = (rev << 1) | ((code >> b) & 1); b += 1 }
            val entry = ((syms(idx) << 4) | len).toChar
            var slot = rev
            while (slot < 512) { table(slot) = entry; slot += 1 << len }
          }
          idx += 1
          code += 1
          c += 1
        }
        code <<= 1
        len += 1
      }
    }
  }

  /** One symbol off the stream: 9-bit table hit on the hot path, the
    * puff-style counted walk (`first` = canonical first code per length,
    * `index` = symbol-table base) for >9-bit codes and the unassigned
    * patterns of incomplete distance trees. */
  private def decodeSym(r: BitReader, h: Huff): Int = {
    val e = h.table(r.peek9())
    if (e != 0) {
      r.consume(e & 15) // fails when the code is longer than the stream
      return e >> 4
    }
    var code = 0
    var first = 0
    var index = 0
    var len = 1
    while (len <= 15) {
      code |= r.bit()
      val c = h.count(len)
      if (code - first < c) return h.syms(index + (code - first))
      index += c
      first = (first + c) << 1
      code <<= 1
      len += 1
    }
    fail()
  }

  // RFC 1951 §3.2.5 length/distance code tables
  private val LenBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23,
    27, 31, 35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258)
  private val LenExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2,
    3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0)
  private val DistBase = Array(1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97,
    129, 193, 257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145, 8193,
    12289, 16385, 24577)
  private val DistExtra = Array(0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6,
    7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13)

  // fixed tables (RFC 1951 §3.2.6); built once
  private val FixedLit: Huff = {
    val l = new Array[Int](288)
    var i = 0
    while (i < 144) { l(i) = 8; i += 1 }
    while (i < 256) { l(i) = 9; i += 1 }
    while (i < 280) { l(i) = 7; i += 1 }
    while (i < 288) { l(i) = 8; i += 1 }
    new Huff(l, 288)
  }
  private val FixedDist: Huff = {
    val l = Array.fill(30)(5)
    new Huff(l, 30)
  }

  /** §3.2.7 code-length-code transmission order. */
  private val ClOrder =
    Array(16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15)

  /** Inflate a raw DEFLATE stream starting at byte `startByte`. Returns the
    * decoded bytes and the first byte offset AFTER the stream (the final
    * block's last bit rounded up — where a wrapper's checksum trailer
    * begins). Output larger than `cap` is malformed (bomb guard).
    */
  def raw(bytes: Array[Byte], startByte: Int, cap: Int): (Array[Byte], Int) = {
    val r = new BitReader(bytes, startByte)
    var buf = new Array[Byte](math.min(math.max(cap, 1), 1 << 14))
    var outLen = 0
    // grow once per copy (bomb-capped), so the hot loops run unchecked
    def ensure(extra: Int): Unit = {
      val need = outLen.toLong + extra
      if (need > cap) fail()
      if (need > buf.length) {
        var sz = buf.length.toLong
        while (sz < need) sz *= 2
        buf = java.util.Arrays.copyOf(buf, math.min(cap.toLong, sz).toInt)
      }
    }
    def push(b: Byte): Unit = {
      ensure(1)
      buf(outLen) = b
      outLen += 1
    }
    def block(lit: Huff, dist: Huff): Unit = {
      var run = true
      while (run) {
        val sym = decodeSym(r, lit)
        if (sym < 256) push(sym.toByte)
        else if (sym == 256) run = false
        else {
          if (sym > 285) fail() // 286/287 exist in the fixed tree but are invalid
          val li = sym - 257
          val length = LenBase(li) + r.bits(LenExtra(li))
          val ds = decodeSym(r, dist)
          if (ds > 29) fail()
          val d = DistBase(ds) + r.bits(DistExtra(ds))
          if (d > outLen) fail() // reaches before output start: no preset dict
          ensure(length)
          if (d >= length) { // disjoint: one bulk copy
            System.arraycopy(buf, outLen - d, buf, outLen, length)
            outLen += length
          } else { // overlapping run: re-read as output grows
            var k = 0
            while (k < length) { buf(outLen) = buf(outLen - d); outLen += 1; k += 1 }
          }
        }
      }
    }
    var fin = false
    while (!fin) {
      fin = r.bit() == 1
      r.bits(2) match {
        case 0 => // stored
          r.align()
          val i = r.byteOff
          if (i + 4 > bytes.length) fail()
          val len = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
          val nlen = (bytes(i + 2) & 0xff) | ((bytes(i + 3) & 0xff) << 8)
          if ((len ^ 0xffff) != nlen) fail()
          if (i + 4 + len > bytes.length) fail()
          ensure(len)
          System.arraycopy(bytes, i + 4, buf, outLen, len)
          outLen += len
          r.seekByte(i + 4 + len)
        case 1 =>
          block(FixedLit, FixedDist)
        case 2 =>
          val hlit = r.bits(5) + 257
          val hdist = r.bits(5) + 1
          val hclen = r.bits(4) + 4
          if (hlit > 286 || hdist > 30) fail()
          val cl = new Array[Int](19)
          var i = 0
          while (i < hclen) { cl(ClOrder(i)) = r.bits(3); i += 1 }
          val clH = new Huff(cl, 19)
          if (!clH.complete) fail()
          val lens = new Array[Int](hlit + hdist)
          i = 0
          while (i < lens.length) {
            val s = decodeSym(r, clH)
            if (s < 16) { lens(i) = s; i += 1 }
            else {
              var rep = 0
              var v = 0
              if (s == 16) {
                if (i == 0) fail() // copy-previous with no previous
                v = lens(i - 1)
                rep = 3 + r.bits(2)
              } else if (s == 17) rep = 3 + r.bits(3)
              else rep = 11 + r.bits(7)
              if (i + rep > lens.length) fail() // repeat runs off the end
              var k = 0
              while (k < rep) { lens(i) = v; i += 1; k += 1 }
            }
          }
          val litH = new Huff(lens.take(hlit), hlit)
          if (!litH.complete) fail() // zlib discipline: lit/len must be complete
          val distLens = new Array[Int](hdist)
          System.arraycopy(lens, hlit, distLens, 0, hdist)
          val distH = new Huff(distLens, hdist)
          // distance may be incomplete (matchless data); unmatched patterns
          // then fail inside decodeSym
          block(litH, distH)
        case _ => fail() // BTYPE 3 reserved
      }
    }
    (java.util.Arrays.copyOf(buf, outLen), r.ceilByteOff)
  }

  // ---- from-scratch checksums (NOT java.util.zip: the fixture encoders
  // stamp trailers with the JDK's CRC32, so verification here is a genuine
  // cross-implementation check) ----

  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var n = 0
    while (n < 256) {
      var c = n
      var k = 0
      while (k < 8) {
        c = if ((c & 1) != 0) 0xedb88320 ^ (c >>> 1) else c >>> 1
        k += 1
      }
      t(n) = c
      n += 1
    }
    t
  }

  /** CRC-32 (reflected, poly 0xEDB88320) over `bytes[from, until)`. */
  def crc32(bytes: Array[Byte], from: Int, until: Int): Long = {
    var c = 0xffffffff
    var i = from
    while (i < until) {
      c = CrcTable((c ^ bytes(i)) & 0xff) ^ (c >>> 8)
      i += 1
    }
    (~c).toLong & 0xffffffffL
  }

  /** Adler-32 (RFC 1950 §8): mod-65521 pair, deferred by the standard 5552
    * byte batch (the largest n with 255n(n+1)/2 + (n+1)(65520) < 2^32). */
  def adler32(bytes: Array[Byte]): Long = {
    var a = 1
    var b = 0
    var i = 0
    val n = bytes.length
    while (i < n) {
      val end = math.min(i + 5552, n)
      while (i < end) {
        a += bytes(i) & 0xff
        b += a
        i += 1
      }
      a %= 65521
      b %= 65521
    }
    ((b.toLong << 16) | a.toLong) & 0xffffffffL
  }
}

/** zlib (RFC 1950) wrapper around [[Inflate.raw]]: CMF/FLG validation,
  * EXACT expected output length, full-stream consumption, and a verified
  * from-scratch Adler-32. The [[PngDecode]] IDAT path decodes through this
  * (replacing `java.util.zip.Inflater`) — the PNG oracle staying hash-
  * identical is the cross-engine proof of the DEFLATE core.
  */
object ZlibInflate {

  def decode(bytes: Array[Byte], expected: Int): Array[Byte] = {
    if (bytes.length < 6) Inflate.fail()
    val cmf = bytes(0) & 0xff
    val flg = bytes(1) & 0xff
    if ((cmf & 0x0f) != 8) Inflate.fail()       // method: deflate only
    if ((cmf >> 4) > 7) Inflate.fail()          // window > 32K invalid
    if ((cmf * 256 + flg) % 31 != 0) Inflate.fail() // FCHECK
    if ((flg & 0x20) != 0) Inflate.fail()       // FDICT: no preset dictionaries
    val (out, end) = Inflate.raw(bytes, 2, expected)
    if (out.length != expected) Inflate.fail()
    if (end + 4 != bytes.length) Inflate.fail() // exactly the Adler trailer left
    val adler = ((bytes(end) & 0xffL) << 24) | ((bytes(end + 1) & 0xffL) << 16) |
      ((bytes(end + 2) & 0xffL) << 8) | (bytes(end + 3) & 0xffL)
    if (adler != Inflate.adler32(out)) Inflate.fail()
    out
  }
}

/** gzip (RFC 1952) member decode + content digest — see [[Inflate]]. */
object GzipDecode {

  /** Output cap: an adversarial member cannot allocate past this (a 64 MiB
    * bound; corpus payloads are KBs). */
  val MaxOut: Int = 1 << 26

  val schema: StructType = StructType(Seq(
    StructField("method", LongType, nullable = false),
    StructField("flags", LongType, nullable = false),
    StructField("mtime", LongType, nullable = false),
    StructField("os", LongType, nullable = false),
    StructField("fname", StringType, nullable = true),
    StructField("n_out", LongType, nullable = false),
    StructField("text_md5", StringType, nullable = false),
    StructField("n_members", LongType, nullable = false)))

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  def stats(bytes: Array[Byte]): InternalRow =
    try {
      val n = bytes.length
      if (n < 18) Inflate.fail() // 10 header + ≥0 deflate + 8 trailer
      // RFC 1952 §2.2: "A gzip file consists of a series of members" — the
      // layout concatenated web-crawl archives actually use. Walk EVERY
      // member (each header fully parsed, each CRC-32/ISIZE trailer
      // verified); the emitted header fields are the FIRST member's, the
      // content digest runs over the concatenated decoded bytes, and the
      // member count is part of the output contract.
      var off = 0
      var nMembers = 0L
      var total = 0L
      var cm0 = -1L; var flg0 = -1L; var mtime0 = -1L; var os0 = -1L
      var fname0: String = null
      val dg = md5Local.get()
      dg.reset()
      while (off < n) {
        val hdrStart = off
        if (off + 10 > n) Inflate.fail()
        if ((bytes(off) & 0xff) != 0x1f || (bytes(off + 1) & 0xff) != 0x8b)
          Inflate.fail()
        val cm = bytes(off + 2) & 0xff
        if (cm != 8) Inflate.fail()
        val flg = bytes(off + 3) & 0xff
        if ((flg & 0xe0) != 0) Inflate.fail() // reserved FLG bits must be zero
        val mtime = (bytes(off + 4) & 0xffL) | ((bytes(off + 5) & 0xffL) << 8) |
          ((bytes(off + 6) & 0xffL) << 16) | ((bytes(off + 7) & 0xffL) << 24)
        val os = bytes(off + 9) & 0xffL
        off += 10
        if ((flg & 4) != 0) { // FEXTRA
          if (off + 2 > n) Inflate.fail()
          val xlen = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
          off += 2 + xlen
          if (off > n) Inflate.fail()
        }
        var fname: String = null
        if ((flg & 8) != 0) { // FNAME: zero-terminated ISO 8859-1
          val start = off
          while (off < n && bytes(off) != 0) off += 1
          if (off >= n) Inflate.fail()
          fname = new String(bytes, start, off - start, "ISO-8859-1")
          off += 1
        }
        if ((flg & 16) != 0) { // FCOMMENT: zero-terminated, skipped
          while (off < n && bytes(off) != 0) off += 1
          if (off >= n) Inflate.fail()
          off += 1
        }
        if ((flg & 2) != 0) { // FHCRC: low 16 bits of the member-header CRC-32
          if (off + 2 > n) Inflate.fail()
          val read = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
          if (read != (Inflate.crc32(bytes, hdrStart, off) & 0xffffL).toInt)
            Inflate.fail()
          off += 2
        }
        val remaining = MaxOut - total
        if (remaining < 0) Inflate.fail()
        val (out, end) = Inflate.raw(bytes, off, remaining.toInt)
        if (out.length > remaining) Inflate.fail() // bomb guard across members
        if (end + 8 > n) Inflate.fail()
        def le32(i: Int): Long = (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
          ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
        if (le32(end) != Inflate.crc32(out, 0, out.length)) Inflate.fail()
        if (le32(end + 4) != (out.length.toLong & 0xffffffffL)) Inflate.fail()
        off = end + 8
        dg.update(out)
        total += out.length
        if (nMembers == 0L) {
          cm0 = cm.toLong; flg0 = flg.toLong; mtime0 = mtime; os0 = os
          fname0 = fname
        }
        nMembers += 1
      }
      if (nMembers == 0L) Inflate.fail()
      val h = dg.digest()
      val hex = new Array[Char](32)
      var i = 0
      while (i < 16) {
        hex(2 * i) = HexDigits((h(i) >> 4) & 0xf)
        hex(2 * i + 1) = HexDigits(h(i) & 0xf)
        i += 1
      }
      new GenericInternalRow(Array[Any](
        cm0, flg0, mtime0, os0,
        if (fname0 == null) null else UTF8String.fromString(fname0),
        total, UTF8String.fromString(new String(hex)), nMembers))
    } catch { case scala.util.control.NonFatal(_) => null }
}

case class GzipStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = GzipDecode.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gzip_stats expects binary, got ${t.simpleString}")
  }

  override def nullSafeEval(b: Any): Any =
    GzipDecode.stats(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
       |${ev.value} = graft.functions.GzipDecode.stats($b);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

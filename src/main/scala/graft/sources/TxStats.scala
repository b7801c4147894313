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
  * timestamp encoding) carry no usable stats by parquet convention and are
  * skipped — those columns simply never prune.
  */
object TxStats {

  /** One column's file-level range; min/max carried as strings so the JSON
    * commit log round-trips them exactly (`Double.toString` shortest-repr
    * parses back to the identical double). `bloom` is the optional
    * point-lookup complement (see [[BloomStat]]): ranges prune RANGE
    * probes after a clustered rewrite, but a high-cardinality equality
    * probe on a non-leading column sees every file's [min,max] span the
    * whole domain — the bloom is what proves absence there.
    */
  case class ColStats(t: String, min: String, max: String,
                      bloom: Option[BloomStat] = None)

  /** Per-file Bloom filter over a column's values (the Delta "bloom filter
    * index" read path): `m` bits, `k` salted-h24 probes per value — the
    * SAME portable hash family [[graft.functions.BloomAgg]] uses, over the
    * value's canonical decimal/UTF-8 string, so build (a one-pass
    * aggregation at write time) and probe (driver-side, here) cannot
    * disagree. No false negatives: an inserted value always probes
    * all-ones, so `contains == false` is a proof of absence and pruning on
    * it is result-identical by construction.
    */
  case class BloomStat(m: Int, k: Int, bits: Array[Long]) {
    def contains(key: String): Boolean = {
      var j = 0
      while (j < k) {
        val pos = graft.functions.BloomAgg.pos(j, key, m)
        if ((bits(pos >> 6) & (1L << (pos & 63))) == 0L) return false
        j += 1
      }
      true
    }
    def toBase64: String = {
      val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
      bits.foreach(bb.putLong)
      java.util.Base64.getEncoder.encodeToString(bb.array())
    }
  }

  object BloomStat {
    def fromBase64(m: Int, k: Int, b64: String): BloomStat = {
      val bb = java.nio.ByteBuffer.wrap(java.util.Base64.getDecoder.decode(b64))
      val bits = new Array[Long](bb.remaining() / 8)
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
      val perBlock: Seq[Map[String, ColStats]] = blocks.map { b =>
        b.getColumns.asScala.flatMap { c =>
          val name = c.getPath.toDotString
          val st = c.getStatistics
          if (st == null || st.isEmpty || !st.hasNonNullValue) None
          else chunkStats(c.getPrimitiveType, st).map(name -> _)
        }.toMap
      }
      // a column survives only when present in every row group; ranges merge
      val stats = perBlock.head.keySet
        .filter(k => perBlock.forall(_.contains(k)))
        .flatMap { k =>
          val cs = perBlock.map(_(k))
          if (cs.map(_.t).distinct.size != 1) None
          else cs.head.t match {
            case "long" => Some(k -> ColStats("long",
              cs.map(_.min.toLong).min.toString, cs.map(_.max.toLong).max.toString))
            case "double" => Some(k -> ColStats("double",
              cs.map(_.min.toDouble).min.toString, cs.map(_.max.toDouble).max.toString))
            case "string" =>
              // merge row-group ranges in the SAME order the prover compares
              // (unsigned UTF-8 bytes): Java's String min/max is UTF-16 code
              // units, which inverts for supplementary-plane characters and
              // would record a file min/max excluding values the file holds
              Some(k -> ColStats("string",
                cs.map(_.min).reduce((a, b) => if (cmpUtf8(a, b) <= 0) a else b),
                cs.map(_.max).reduce((a, b) => if (cmpUtf8(a, b) >= 0) a else b)))
            case _ => None
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
    case _ => true
  }

  /** a = b (either side the attribute): the range must contain the literal
    * AND, when the file carries a bloom for the column, the bloom must not
    * prove the value absent. */
  private def eqMay(stats: Map[String, ColStats], a: Expression, b: Expression): Boolean =
    bind(stats, a, b).orElse(bind(stats, b, a)).forall { case (cs, v) =>
      cmp(cs.min, v, cs.t) <= 0 && cmp(cs.max, v, cs.t) >= 0 &&
        cs.bloom.forall(bl => bloomKey(cs.t, v).forall(bl.contains))
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
    bind(stats, hi, lo).forall { case (cs, v) =>
      val c = cmp(cs.max, v, cs.t)
      if (strict) c > 0 else c >= 0
    } && // Case 2: lo is the attribute → need min(attr) < hi.
    bind(stats, lo, hi).forall { case (cs, v) =>
      val c = cmp(cs.min, v, cs.t)
      if (strict) c < 0 else c <= 0
    }
  }

  /** (stats-for-attr, comparable literal) when `a` is a stats-carrying
    * attribute and `b` a non-null literal of a compatible type.
    */
  private def bind(stats: Map[String, ColStats], a: Expression,
                   b: Expression): Option[(ColStats, Any)] = {
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
      v <- b match {
        case Literal(v, dt) if v != null => comparable(cs.t, v, dt)
        case _ => None
      }
    } yield (cs, v)
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

package graft

/** DuckDB twins of the derived tables in [[Tables]]. Each query's
  * `oracleSql` is assembled from these so the Spark derivation and the
  * DuckDB derivation live in one place each and visibly mirror each other.
  * Target dialect: DuckDB 1.x, portable SQL only (no crc32/conv — see
  * [[h24]]).
  */
object Oracle {

  /** Portable 24-bit md5-prefix hash — twin of [[Tables.h24]]. Expands to
    * strpos arithmetic over the first 6 hex digits of md5(expr).
    */
  def h24(expr: String): String =
    (1 to 6).map { i =>
      s"(strpos('0123456789abcdef', substr(md5($expr),$i,1))-1)*${1L << (4 * (6 - i))}"
    }.mkString("(", " + ", ")")

  /** Twin of [[Tables.h24Slice]]: the 6-hex window starting at digit
    * 1 + 6·slice of the same digest.
    */
  def h24Slice(expr: String, slice: Int): String =
    (1 to 6).map { i =>
      s"(strpos('0123456789abcdef', substr(md5($expr),${6 * slice + i},1))-1)*${1L << (4 * (6 - i))}"
    }.mkString("(", " + ", ")")

  /** Portable 48-bit md5-prefix hash — twin of [[Tables.h48]] (the
    * band-selectivity-at-scale variant; rationale there). First 12 hex
    * digits; weights up to 16^11 stay well inside BIGINT.
    */
  def h48(expr: String): String =
    (1 to 12).map { i =>
      s"(strpos('0123456789abcdef', substr(md5($expr),$i,1))-1)*${1L << (4 * (12 - i))}"
    }.mkString("(", " + ", ")")

  /** `catalog(sft, value)` — twin of [[Tables.catalog]]. */
  val catalogCte: String =
    """sfts AS (SELECT DISTINCT event_type AS sft FROM events),
      |catalog AS (
      |  SELECT sft, '  CATALOG_' || upper(sft) || '_' || s.suffix || '  ' AS value
      |  FROM sfts CROSS JOIN (VALUES ('Z3'),('Z2'),('ID'),('ATTR')) AS s(suffix)
      |  UNION ALL
      |  SELECT sft, 'metadata_' || sft AS value FROM sfts
      |)""".stripMargin

  /** `registry(name, host, port, user, password)` — twin of [[Tables.registry]]. */
  val registryCte: String =
    """registry AS (
      |  SELECT s_name AS name,
      |         '10.148.128.' || CAST(s_suppkey % 250 AS VARCHAR) AS host,
      |         22 AS port,
      |         'user_' || CAST(s_suppkey AS VARCHAR) AS "user",
      |         'pw_' || CAST(s_suppkey AS VARCHAR) AS password
      |  FROM supplier
      |)""".stripMargin

  /** `schema_tables(sft, table_name)` — twin of [[Tables.schemaTables]].
    * Requires [[catalogCte]] before it.
    */
  val schemaTablesCte: String =
    """schema_tables AS (
      |  SELECT sft, lower(trim(value)) AS table_name FROM catalog
      |  WHERE lower(trim(value)) LIKE 'catalog%'
      |)""".stripMargin

  /** `compaction_lines(node, table_name, line)` — twin of
    * [[Tables.compactionLines]]. Requires registry + catalog + schema_tables.
    */
  val compactionLinesCte: String =
    s"""compaction_lines AS (
       |  SELECT r.name AS node, t.table_name,
       |         'c' || CAST((${h24("r.name")} + ${h24("t.table_name")}) % 100000 AS VARCHAR)
       |           || '-id   Compaction   ks1   ' || t.table_name
       |           || '   5123456   10234567   bytes   50.05%' AS line
       |  FROM registry r CROSS JOIN schema_tables t
       |  WHERE (${h24("r.name")} + ${h24("t.table_name")}) % 3 = 0
       |)""".stripMargin

  /** `compaction_stdout(node, command, stdout, stderr, exit_status)` — twin
    * of [[Tables.compactionStdout]].
    */
  val compactionStdoutCte: String =
    """compaction_stdout AS (
      |  SELECT node, 'nodetool compactionstats' AS command,
      |         'pending tasks: 2' || chr(10) ||
      |           string_agg(line, chr(10) ORDER BY line) AS stdout,
      |         '' AS stderr, 0 AS exit_status
      |  FROM compaction_lines GROUP BY node
      |)""".stripMargin

  /** `snapshot_lines(node, table_name, line)` — twin of [[Tables.snapshotLines]]. */
  val snapshotLinesCte: String =
    s"""snapshot_lines AS (
       |  SELECT r.name AS node, t.table_name,
       |         'snap_' || CAST(${h24("t.table_name")} % 1000 AS VARCHAR)
       |           || '   ks1   ' || t.table_name || '   12.3 MB   45.6 MB' AS line
       |  FROM registry r CROSS JOIN schema_tables t
       |  WHERE (${h24("r.name")} + ${h24("t.table_name")}) % 2 = 0
       |)""".stripMargin

  /** `describe_results(sft, table_name, stdout, stderr)` — twin of
    * [[Tables.describeResults]].
    */
  val describeResultsCte: String =
    s"""describe_results AS (
       |  SELECT sft, table_name,
       |    CASE WHEN ${h24("table_name")} % 7 = 0 THEN ''
       |         ELSE 'CREATE TABLE ks1.' || table_name || ' (...)' END AS stdout,
       |    CASE WHEN ${h24("table_name")} % 7 = 0
       |         THEN '''' || table_name || ''' not found in keyspace ''ks1'''
       |         ELSE '' END AS stderr
       |  FROM schema_tables
       |)""".stripMargin

  /** `info_results(node, stdout)` — twin of [[Tables.infoResults]]. */
  val infoResultsCte: String =
    """info_results AS (
      |  SELECT s_name AS node,
      |    'ID : n' || chr(10) || 'Gossip active : ' ||
      |      CASE WHEN s_suppkey % 2 = 1 THEN 'true' ELSE 'false' END || chr(10) ||
      |      'Thrift active : true' || chr(10) ||
      |      'Native Transport active : true' || chr(10) || 'Load : 1 GiB' AS stdout
      |  FROM supplier
      |)""".stripMargin

  /** Assemble `WITH a, b, c <select>` from CTE fragments. */
  def withCtes(ctes: String*)(select: String): String =
    "WITH " + ctes.mkString(",\n") + "\n" + select

  /** Same, but `WITH RECURSIVE` — for oracles whose twin is an iterated
    * fixed point (e.g. connected components).
    */
  def withRecursiveCtes(ctes: String*)(select: String): String =
    "WITH RECURSIVE " + ctes.mkString(",\n") + "\n" + select
}

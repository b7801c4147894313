package graft.operators

import graft.{Oracle, QueryPack}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-contract registration for [[ParseOps]] (SURVEY §2 rows S5, T3/T5/T6,
  * F5/F6/F9, C1–C4, A1/A4/A5, J1, O1/O2).
  */
object ParsePack extends QueryPack {
  import Oracle._

  private val TargetTable = "catalog_purchase_z3"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s5_parse_compactions" -> ((s, d) => ParseOps.parseCompactions(s, d)),
    "s5_parse_snapshots" -> ((s, d) => ParseOps.parseSnapshots(s, d)),
    "f6_parse_totality" -> ((s, d) => ParseOps.parseTotality(s, d)),
    "c2_find_table_compactions" -> ((s, d) => ParseOps.findTableCompactions(s, d, "ks1", TargetTable)),
    "c2_find_table_snapshots" -> ((s, d) => ParseOps.findTableSnapshots(s, d, "ks1", TargetTable)),
    "f9_node_liveness" -> ((s, d) => ParseOps.nodeLiveness(s, d)),
    "a1_cluster_up" -> ((s, d) => ParseOps.clusterUp(s, d)),
    "a4_gather_compaction_ids" -> ((s, d) => ParseOps.gatherCompactionIds(s, d)),
    "j1_zip_join" -> ((s, d) => ParseOps.zipJoin(s, d)),
    "c3_cmd_outcomes" -> ((s, d) => ParseOps.cmdOutcomes(s, d)),
    "c4_named_lookup" -> ((s, d) => ParseOps.namedLookup(s, d, "Supplier#000000001")),
    "c4_unknown_node" -> ((s, d) => ParseOps.namedLookupOutcome(s, d, "no-such-node")),
    "o1_pick_coordinator" -> ((s, d) => ParseOps.pickCoordinator(s, d)),
    "o2_seed_node" -> ((s, d) => ParseOps.seedNode(s, d)),
  )

  private val compRe = """([0-9a-zA-Z_-]+)\s+([0-9a-zA-Z_]+)\s+([0-9a-zA-Z_-]+)\s+([0-9a-zA-Z_-]+)"""
  private val snapRe = """([0-9a-zA-Z_-]+)\s+([0-9a-zA-Z_]+)\s+([0-9a-zA-Z_-]+)"""
  private val liveRe = "Gossip active : true.*Thrift active : true.*Native Transport active : true"

  private val compactionBase = Seq(catalogCte, schemaTablesCte, registryCte,
    compactionLinesCte, compactionStdoutCte)

  private val parsedCompactionsSql =
    s"""SELECT node,
       |  regexp_extract(line, '$compRe', 1) AS id,
       |  regexp_extract(line, '$compRe', 2) AS type,
       |  regexp_extract(line, '$compRe', 3) AS keyspace,
       |  regexp_extract(line, '$compRe', 4) AS table_name
       |FROM (SELECT node, unnest(string_split(stdout, chr(10))) AS line
       |      FROM compaction_stdout)
       |WHERE regexp_extract(line, '$compRe', 1) <> ''""".stripMargin

  val oracles: Map[String, String] = Map(
    "s5_parse_compactions" ->
      withCtes(compactionBase: _*)(parsedCompactionsSql),
    "s5_parse_snapshots" ->
      withCtes(catalogCte, schemaTablesCte, registryCte, snapshotLinesCte)(
        s"""SELECT node,
           |  regexp_extract(line, '$snapRe', 1) AS name,
           |  regexp_extract(line, '$snapRe', 2) AS keyspace,
           |  regexp_extract(line, '$snapRe', 3) AS snap_table
           |FROM snapshot_lines
           |WHERE regexp_extract(line, '$snapRe', 1) <> ''""".stripMargin),
    "f6_parse_totality" ->
      withCtes(compactionBase: _*)(
        s"""SELECT node, count(*) AS n_lines,
           |  count(CASE WHEN regexp_extract(line, '$compRe', 1) <> '' THEN 1 END) AS n_parsed
           |FROM (SELECT node, unnest(string_split(stdout, chr(10))) AS line
           |      FROM compaction_stdout)
           |GROUP BY node""".stripMargin),
    "c2_find_table_compactions" ->
      withCtes(compactionBase: _*)(
        s"""SELECT node, id FROM ($parsedCompactionsSql)
           |WHERE keyspace = 'ks1' AND table_name = '$TargetTable'""".stripMargin),
    "c2_find_table_snapshots" ->
      withCtes(catalogCte, schemaTablesCte, registryCte, snapshotLinesCte)(
        s"""SELECT node, regexp_extract(line, '$snapRe', 1) AS name
           |FROM snapshot_lines
           |WHERE regexp_extract(line, '$snapRe', 1) <> ''
           |  AND regexp_extract(line, '$snapRe', 2) = 'ks1'
           |  AND regexp_extract(line, '$snapRe', 3) = '$TargetTable'""".stripMargin),
    "f9_node_liveness" ->
      withCtes(infoResultsCte)(
        s"SELECT node, regexp_matches(stdout, '$liveRe', 's') AS is_up FROM info_results"),
    "a1_cluster_up" ->
      withCtes(infoResultsCte)(
        s"""SELECT bool_and(regexp_matches(stdout, '$liveRe', 's')) AS cluster_up,
           |  count(CASE WHEN regexp_matches(stdout, '$liveRe', 's') THEN 1 END) AS n_up,
           |  count(*) AS n_nodes
           |FROM info_results""".stripMargin),
    "a4_gather_compaction_ids" ->
      withCtes(compactionBase: _*)(
        s"""SELECT node, string_agg(id, ',' ORDER BY id) AS ids,
           |  count(*) AS n_compactions
           |FROM ($parsedCompactionsSql) GROUP BY node""".stripMargin),
    "j1_zip_join" ->
      withCtes(catalogCte, schemaTablesCte, describeResultsCte)(
        """SELECT l.idx, l.table_name, r.tbl_exists FROM
          |  (SELECT table_name,
          |     row_number() OVER (ORDER BY table_name) AS idx FROM schema_tables) l
          |JOIN
          |  (SELECT (stderr = '') AS tbl_exists,
          |     row_number() OVER (ORDER BY table_name) AS idx FROM describe_results) r
          |USING (idx)""".stripMargin),
    "c3_cmd_outcomes" ->
      withCtes(infoResultsCte)(
        s"""SELECT node, (ex = 0) AS ok,
           |  CASE WHEN ex = 0 THEN stdout END AS output,
           |  CASE WHEN ex <> 0 THEN 'command failed on ' || node END AS error
           |FROM (SELECT node, stdout,
           |        CASE WHEN ${h24("node")} % 5 = 0 THEN 1 ELSE 0 END AS ex
           |      FROM info_results)""".stripMargin),
    "c4_named_lookup" ->
      withCtes(registryCte)(
        "SELECT name, host, port, \"user\", password FROM registry WHERE name = 'Supplier#000000001'"),
    "c4_unknown_node" ->
      withCtes(registryCte)(
        """SELECT 'no-such-node' AS name, (n > 0) AS found,
          |  CASE WHEN n > 0 THEN NULL
          |       ELSE 'node ''no-such-node'' not found in remotes registry' END AS error
          |FROM (SELECT count(CASE WHEN name = 'no-such-node' THEN 1 END) AS n
          |      FROM registry)""".stripMargin),
    "o1_pick_coordinator" ->
      withCtes(registryCte)(
        "SELECT arg_min(name, md5(name)) AS coordinator FROM registry"),
    "o2_seed_node" ->
      withCtes(registryCte)("SELECT min(name) AS seed FROM registry"),
  )
}

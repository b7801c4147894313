package graft.operators

import graft.{Oracle, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-contract registration for [[CatalogOps]] (SURVEY §2 rows S2,
  * F1–F4, F7/F8, J2, A1–A3, M1).
  */
object CatalogPack extends QueryPack {
  import Oracle._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s2_catalog_scan" -> ((s, d) => Tables.catalog(s, d)),
    "f1_project_sfts" -> ((s, d) => CatalogOps.projectSfts(s, d)),
    "a2_list_sfts" -> ((s, d) => CatalogOps.listSfts(s, d)),
    "a3_count_sfts" -> ((s, d) => CatalogOps.countSfts(s, d)),
    "f2_find_schema_tables" -> ((s, d) => CatalogOps.findSchemaTables(s, d, "purchase")),
    "f4_cqlsh_frame_filter" -> ((s, d) => CatalogOps.cqlshFrameFilter(s, d)),
    "f7_f8_table_existence" -> ((s, d) => CatalogOps.tableExistence(s, d)),
    "j2_missing_tables" -> ((s, d) => CatalogOps.missingTables(s, d)),
    "j2_present_tables" -> ((s, d) => CatalogOps.presentTables(s, d)),
    "a1_schema_complete" -> ((s, d) => CatalogOps.schemaComplete(s, d)),
    "m1_catalog_after_delete" -> ((s, d) => CatalogOps.catalogAfterDelete(s, d, "error")),
  )

  private val existsF8 = "(contains(stdout, 'CREATE TABLE') AND stderr = '')"

  val oracles: Map[String, String] = Map(
    "s2_catalog_scan" ->
      withCtes(catalogCte)("SELECT sft, value FROM catalog"),
    "f1_project_sfts" ->
      withCtes(catalogCte)("SELECT sft FROM catalog"),
    "a2_list_sfts" ->
      withCtes(catalogCte)("SELECT DISTINCT sft FROM catalog"),
    "a3_count_sfts" ->
      withCtes(catalogCte)(
        "SELECT CAST(count(*) AS BIGINT) AS n_sfts FROM (SELECT DISTINCT sft FROM catalog)"),
    "f2_find_schema_tables" ->
      withCtes(catalogCte)(
        """SELECT lower(trim(value)) AS table_name FROM catalog
          |WHERE sft = 'purchase' AND lower(trim(value)) LIKE 'catalog%'""".stripMargin),
    "f4_cqlsh_frame_filter" ->
      withCtes(catalogCte)(
        """SELECT DISTINCT trim(line) AS sft FROM (
          |  SELECT '    ' || sft AS line FROM catalog
          |  UNION ALL
          |  SELECT * FROM (VALUES (' sft'),('-----------'),(''),('(5 rows)')) AS v(line)
          |) WHERE line LIKE '    %'""".stripMargin),
    "f7_f8_table_existence" ->
      withCtes(catalogCte, schemaTablesCte, describeResultsCte)(
        s"""SELECT sft, table_name,
           |  NOT contains(stderr, 'not found') AS exists_f7,
           |  $existsF8 AS exists_f8
           |FROM describe_results""".stripMargin),
    "j2_missing_tables" ->
      withCtes(catalogCte, schemaTablesCte, describeResultsCte)(
        s"""SELECT sft, table_name FROM schema_tables
           |WHERE table_name NOT IN
           |  (SELECT table_name FROM describe_results WHERE $existsF8)""".stripMargin),
    "j2_present_tables" ->
      withCtes(catalogCte, schemaTablesCte, describeResultsCte)(
        s"""SELECT sft, table_name FROM schema_tables
           |WHERE table_name IN
           |  (SELECT table_name FROM describe_results WHERE $existsF8)""".stripMargin),
    "a1_schema_complete" ->
      withCtes(catalogCte, schemaTablesCte, describeResultsCte)(
        s"""SELECT sft, bool_and($existsF8) AS complete,
           |  CAST(count(*) AS BIGINT) AS n_tables
           |FROM describe_results GROUP BY sft""".stripMargin),
    "m1_catalog_after_delete" ->
      withCtes(catalogCte)("SELECT sft, value FROM catalog WHERE sft <> 'error'"),
  )
}

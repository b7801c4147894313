package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}

/** SQL `CALL` surface for the format's OPERATIONAL verbs (r15, the DSv2
  * `ProcedureCatalog` seam Spark 4 ships): the maintenance every
  * long-lived table runs — compaction, vacuum, restore — reachable from
  * pure SQL, completing the story the DML catalog started (a SQL-only
  * operator can now run the WHOLE lifecycle):
  *
  * {{{
  * CALL graft_tx.compact(`table` => 'default.ev', target_files => 4)
  * CALL graft_tx.compact_zorder('default.ev', 8, 'x', 'y')
  * CALL graft_tx.vacuum('default.ev', keep_from_version => 3)
  * CALL graft_tx.restore('default.ev', 2)
  * }}}
  *
  * Each procedure executes the library primitive it names —
  * [[TxTable.compact]]/[[TxTable.compactZ]]/[[TxTable.vacuum]]/
  * [[TxTable.restore]] — as an ordinary optimistic commit (or, for
  * vacuum, the retention sweep), and returns its outcome as rows
  * (`LocalScan` — driver-computed result, metadata-sized). The `table`
  * argument is the catalog identifier (`ns.name` dotted form, the same
  * directories the DML catalog maps); unknown procedures refuse naming
  * the known set. Side-effecting, so every procedure declares
  * nondeterminism.
  */
private[sources] object TxProcedures {

  val Names: Seq[String] =
    Seq("compact", "compact_zorder", "vacuum", "restore", "history")

  def load(catalog: TxCatalog, ident: Identifier): UnboundProcedure = {
    val full = (ident.namespace() :+ ident.name()).mkString(".")
    ident.name() match {
      case n @ "compact" => new UnboundProcedure {
        override def name(): String = n
        override def description(): String =
          "bin-packing compaction of a graft-tx table's live files " +
            "(optionally re-sorted), committed as one layout-only version"
        override def bind(inputType: StructType): BoundProcedure = bound(n,
          Seq(
            ProcedureParameter.in("table", StringType).build(),
            ProcedureParameter.in("target_files", IntegerType)
              .defaultValue("1").build(),
            ProcedureParameter.in("sort_cols", StringType)
              .defaultValue("''").comment("comma-separated").build(),
            ProcedureParameter.in("bloom_cols", StringType)
              .defaultValue("''").comment("comma-separated").build()),
          new StructType().add("version", LongType),
          { (spark, row) =>
            val v = TxTable.compact(spark, catalog.resolveTableRoot(row._1),
              row.int(1), csv(row.str(2)), csv(row.str(3)))
            Seq(longRow(v))
          })
      }
      case n @ "compact_zorder" => new UnboundProcedure {
        override def name(): String = n
        override def description(): String =
          "compaction clustered on the z-order (Morton) interleave of two " +
            "columns — multi-dimensional data skipping"
        override def bind(inputType: StructType): BoundProcedure = bound(n,
          Seq(
            ProcedureParameter.in("table", StringType).build(),
            ProcedureParameter.in("target_files", IntegerType).build(),
            ProcedureParameter.in("x_col", StringType).build(),
            ProcedureParameter.in("y_col", StringType).build()),
          new StructType().add("version", LongType),
          { (spark, row) =>
            val v = TxTable.compactZ(spark, catalog.resolveTableRoot(row._1),
              row.int(1), row.str(2), row.str(3))
            Seq(longRow(v))
          })
      }
      case n @ "vacuum" => new UnboundProcedure {
        override def name(): String = n
        override def description(): String =
          "reclaim files live in NO snapshot at-or-after keep_from_version " +
            "(bounds time travel; staged-uncommitted files grace-windowed)"
        override def bind(inputType: StructType): BoundProcedure = bound(n,
          Seq(
            ProcedureParameter.in("table", StringType).build(),
            ProcedureParameter.in("keep_from_version", LongType).build()),
          new StructType().add("reclaimed_files", LongType),
          { (_, row) =>
            val reclaimed = TxTable.vacuum(catalog.resolveTableRoot(row._1),
              row.long(1))
            Seq(longRow(reclaimed.size.toLong))
          })
      }
      case n @ "restore" => new UnboundProcedure {
        override def name(): String = n
        override def description(): String =
          "restore the table to a past version AS A NEW COMMIT (never " +
            "rewriting history); fails loudly when vacuum already " +
            "reclaimed the needed files"
        override def bind(inputType: StructType): BoundProcedure = bound(n,
          Seq(
            ProcedureParameter.in("table", StringType).build(),
            ProcedureParameter.in("version", LongType).build()),
          new StructType().add("restored_to_version", LongType)
            .add("committed_version", LongType),
          { (spark, row) =>
            val target = row.long(1)
            val v = TxTable.restore(spark, catalog.resolveTableRoot(row._1),
              target)
            Seq(new GenericInternalRow(Array[Any](target, v)))
          })
      }
      case n @ "history" => new UnboundProcedure {
        override def name(): String = n
        override def description(): String =
          "the commit log as rows — version, op, wall clock, row metrics " +
            "(the DESCRIBE HISTORY analog; same data as option history=true)"
        override def bind(inputType: StructType): BoundProcedure = {
          // schema AND rows both derive from TxTable.history — the ONE
          // definition of the audit shape, so the procedure cannot drift
          // from the relation it mirrors (option history=true); a logless
          // root yields the empty frame under that same schema
          val historySchema = TxTable
            .history(SparkSession.active, "/graft-nonexistent-schema-probe")
            .schema
          bound(n,
            Seq(ProcedureParameter.in("table", StringType).build()),
            historySchema,
            { (spark, row) =>
              TxTable.history(spark, catalog.resolveTableRoot(row._1))
                .queryExecution.executedPlan.executeCollect().toSeq
            })
        }
      }
      case other => throw new UnsupportedOperationException(
        s"unknown graft-tx procedure $full (no '$other'); available: " +
          Names.mkString(", "))
    }
  }

  /** Typed accessors over the CALL's argument row (Spark hands arguments
    * aligned to `parameters()` order, defaults materialized). */
  private final class Args(row: InternalRow) {
    def _1: String = str(0)
    def str(i: Int): String = row.getUTF8String(i).toString
    def int(i: Int): Int = row.getInt(i)
    def long(i: Int): Long = row.getLong(i)
  }

  private def csv(s: String): Seq[String] =
    s.split(",").toSeq.map(_.trim).filter(_.nonEmpty)

  private def longRow(v: Long): InternalRow =
    new GenericInternalRow(Array[Any](v))

  private def bound(procName: String, params: Seq[ProcedureParameter],
                    outSchema: StructType,
                    run: (SparkSession, Args) => Seq[InternalRow])
      : BoundProcedure =
    new BoundProcedure {
      override def name(): String = procName
      override def parameters(): Array[ProcedureParameter] = params.toArray
      override def isDeterministic: Boolean = false // side-effecting
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val out = run(SparkSession.active, new Args(input))
        java.util.List.of[Scan](new LocalScan {
          override def rows(): Array[InternalRow] = out.toArray
          override def readSchema(): StructType = outSchema
        }).iterator()
      }
    }
}

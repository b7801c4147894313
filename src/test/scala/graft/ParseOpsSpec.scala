package graft

import graft.operators.ParseOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class ParseOpsSpec extends SparkSpec {

  test("parseCompactions extracts the 4 fields from fixture lines") {
    val rows = ParseOps.parseCompactions(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("type") == "Compaction")
      assert(r.getAs[String]("keyspace") == "ks1")
      assert(r.getAs[String]("table_name").startsWith("catalog_"))
      assert(r.getAs[String]("id").endsWith("-id"))
    }
  }

  test("header and blank lines never parse (F6 miss-filter)") {
    val tot = ParseOps.parseTotality(spark, Sf).collect()
    // each node blob has 1 header line ('pending tasks: 2') that must not parse
    tot.foreach { r =>
      assert(r.getAs[Long]("n_lines") == r.getAs[Long]("n_parsed") + 1)
    }
  }

  test("compaction regex is total: never throws on arbitrary input") {
    val re = ParseOps.CompactionRe.r
    (0 until 500).foreach { i =>
      val s = Gen.asciiStr.apply(Gen.Parameters.default, Seed(i.toLong)).getOrElse("")
      re.findFirstMatchIn(s) // must not throw
    }
  }

  test("liveness regex: all-true up, any-false down") {
    val up = "x\nGossip active : true\nThrift active : true\nNative Transport active : true\ny"
    val down = up.replaceFirst("Gossip active : true", "Gossip active : false")
    assert(up.matches("(?s).*" + ParseOps.LivenessRe + ".*"))
    assert(!down.matches("(?s).*" + ParseOps.LivenessRe + ".*"))
    val rows = ParseOps.nodeLiveness(spark, Sf).collect()
    assert(rows.count(_.getBoolean(1)) == 5) // odd suppkeys of 10 suppliers
  }

  test("findTableCompactions filters to one (ks, table)") {
    val df = ParseOps.findTableCompactions(spark, Sf, "ks1", "catalog_purchase_z3")
    assert(df.columns.toSeq == Seq("node", "id"))
    val all = ParseOps.parseCompactions(spark, Sf)
      .where(col("table_name") === "catalog_purchase_z3").count()
    assert(df.count() == all)
  }

  test("zipJoin carries explicit keys: idx is dense 1..n") {
    val rows = ParseOps.zipJoin(spark, Sf).collect()
    assert(rows.map(_.getAs[Long]("idx")).sorted.toSeq == (1L to rows.length).toSeq)
  }

  test("cmdOutcomes: exactly one of output/error per row (Try semantics)") {
    ParseOps.cmdOutcomes(spark, Sf).collect().foreach { r =>
      assert((r.getAs[String]("output") == null) != (r.getAs[String]("error") == null))
      assert(r.getAs[Boolean]("ok") == (r.getAs[String]("error") == null))
    }
  }
}

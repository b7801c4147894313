package graft

import graft.operators.LifecycleOps
import org.apache.spark.sql.functions._

class LifecycleOpsSpec extends SparkSpec {

  test("removalPlan: 7 ordered stages per schema table") {
    val rows = LifecycleOps.removalPlan(spark, Sf, "purchase").collect()
    assert(rows.length == 4 * 7)
    val orders = rows.map(r => (r.getAs[String]("stage"), r.getAs[Long]("stage_order"))).toMap
    assert(orders("flush") == 1 && orders("compact") == 7)
    assert(orders("stop_compactions") < orders("truncate"))
    assert(orders("truncate") < orders("clear_snapshots"))
    assert(rows.forall(_.getAs[String]("command").contains("catalog_purchase_")))
  }

  test("truncated keeps schema, drops all rows") {
    val t = LifecycleOps.truncated(spark, Sf)
    assert(t.count() == 0)
    assert(t.columns.toSeq == Seq("sft", "value"))
  }

  test("ttlView keeps only rows within ttl of the high-watermark") {
    val kept = LifecycleOps.ttlView(spark, Sf, 7)
    val ev = Tables.events(spark, Sf)
    val hw = ev.agg(max(col("ts"))).collect().head.getTimestamp(0)
    val cutoff = java.sql.Timestamp.from(hw.toInstant.minus(java.time.Duration.ofDays(7)))
    assert(kept.agg(min(col("ts"))).collect().head.getTimestamp(0).after(cutoff))
    assert(kept.count() < ev.count())
  }

  test("restartPoll: timeout iff first-up attempt exceeds the 300s/2s budget") {
    LifecycleOps.restartPoll(spark, Sf).collect().foreach { r =>
      val timedOut = r.getAs[Boolean]("timed_out")
      if (timedOut) assert(r.isNullAt(r.fieldIndex("first_up_attempt")))
      else assert(r.getAs[Long]("elapsed_sec") == 2 * r.getAs[Long]("first_up_attempt"))
    }
  }

  test("removeSchema runs the stage sequence as ordered actions") {
    val stages = LifecycleOps.removeSchema(spark, Sf, "purchase")
    assert(stages.map(_._1) == LifecycleOps.Stages.map(_._2))
  }
  test("afterUpsert: row counts and balance mass reflect updates + inserts exactly") {
    import org.apache.spark.sql.functions._
    val base = Tables.customer(spark, Sf)
    val got = LifecycleOps.afterUpsert(spark, Sf)
      .agg(sum("n_customers"), sum("total_bal")).collect().head
    val nBase = base.count()
    val nIns = base.where(col("c_custkey") % 97 === 0).count()
    assert(got.getLong(0) == nBase + nIns)
    val baseBal = base.agg(sum(col("c_acctbal").cast("decimal(12,2)")))
      .collect().head.getDecimal(0).doubleValue()
    val nUpd = base.where(col("c_custkey") % 7 === 0).count()
    val insBal = base.where(col("c_custkey") % 97 === 0)
      .agg(sum(col("c_acctbal").cast("decimal(12,2)")))
      .collect().head.getDecimal(0).doubleValue()
    assert(math.abs(got.getDouble(1) - (baseBal + 100.0 * nUpd + insBal)) < 1e-4)
  }
}

package graft.streaming

import graft.QueryPack
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-contract registration for [[StreamingOps]] (SURVEY §2 X-ST, S4). */
object StreamingPack extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "xst_tumbling_counts" -> ((s, d) => StreamingOps.tumblingCounts(s, d)),
    "xst_sliding_counts" -> ((s, d) => StreamingOps.slidingCounts(s, d)),
    "xst_session_counts" -> ((s, d) => StreamingOps.sessionCounts(s, d)),
    "xst_watermark_split" -> ((s, d) => StreamingOps.watermarkSplit(s, d)),
    "s4_log_rows" -> ((s, d) => StreamingOps.logRows(s, d)),
    "s4_error_log_rows" -> ((s, d) => StreamingOps.errorLogRows(s, d)),
  )

  private val evCte =
    "e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events)"

  val oracles: Map[String, String] = Map(
    "xst_tumbling_counts" ->
      s"""WITH $evCte
         |SELECT date_trunc('hour', ts) AS window_start, event_type,
         |  count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
         |FROM e GROUP BY 1, 2""".stripMargin,
    "xst_sliding_counts" ->
      s"""WITH $evCte,
         |slid AS (
         |  SELECT event_type,
         |    unnest([
         |      CAST(to_timestamp(CAST(floor(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) / 1800) * 1800 AS BIGINT)) AS TIMESTAMP),
         |      CAST(to_timestamp(CAST(floor(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) / 1800) * 1800 - 1800 AS BIGINT)) AS TIMESTAMP)
         |    ]) AS window_start,
         |    ts
         |  FROM e
         |)
         |SELECT window_start, event_type, count(*) AS n
         |FROM slid
         |WHERE ts >= window_start AND ts < window_start + INTERVAL 1 HOUR
         |GROUP BY 1, 2""".stripMargin,
    "xst_session_counts" ->
      s"""WITH $evCte,
         |flags AS (
         |  SELECT user_id, ts, event_id,
         |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |              >= INTERVAL 10 MINUTE
         |         THEN 1 ELSE 0 END AS new_s
         |  FROM e),
         |sess AS (
         |  SELECT user_id, ts,
         |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM flags)
         |SELECT min(ts) AS session_start,
         |  max(ts) + INTERVAL 10 MINUTE AS session_end,
         |  user_id, count(*) AS n_events
         |FROM sess GROUP BY user_id, sid""".stripMargin,
    "xst_watermark_split" ->
      s"""WITH $evCte,
         |wm AS (SELECT max(ts) - INTERVAL 15 MINUTE AS wm FROM e)
         |SELECT event_type,
         |  count(CASE WHEN ts >= wm THEN 1 END) AS n_on_time,
         |  count(CASE WHEN ts < wm THEN 1 END) AS n_late
         |FROM e CROSS JOIN wm GROUP BY event_type""".stripMargin,
    "s4_log_rows" ->
      s"""WITH $evCte
         |SELECT ts, event_id,
         |  CASE WHEN event_type = 'error' THEN 'ERROR' ELSE 'INFO' END AS level,
         |  'event ' || CAST(event_id AS VARCHAR) || ' type=' || event_type AS message
         |FROM e""".stripMargin,
    "s4_error_log_rows" ->
      s"""WITH $evCte
         |SELECT ts, event_id, 'ERROR' AS level,
         |  'event ' || CAST(event_id AS VARCHAR) || ' type=' || event_type AS message
         |FROM e WHERE event_type = 'error'""".stripMargin,
  )
}

package graft.operators

import graft.QueryPack
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-contract registration for [[GeoOps]] (GeoMesa-domain Z-curve
  * extension). Oracle twins reproduce the Morton interleave with shift/mask
  * arithmetic.
  */
object GeoPack extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "geo_z2_keys" -> ((s, d) => GeoOps.z2Keys(s, d)),
    "geo_z3_keys" -> ((s, d) => GeoOps.z3Keys(s, d)),
    "geo_bbox_filter" -> ((s, d) => GeoOps.bboxFilter(s, d, -60, 0, -30, 30)),
    "geo_path_length" -> ((s, d) => GeoOps.userPathLength(s, d)),
    "geo_z2_range_scan" -> ((s, d) => GeoOps.z2RangeScan(s, d)),
    // written as a plain bbox predicate over the stored z2-keyed layout —
    // the ZRangePruning optimizer rule injects the z2 range (session
    // extension), and the oracle's rule-free SQL proves the injection never
    // drops a row
    "geo_pruned_bbox" -> ((s, d) => GeoOps.z2Layout(s, d)
      .where("lon >= -60 and lon <= 0 and lat >= -30 and lat <= 30")
      .select("event_id", "lon", "lat", "z2")),
    // the (space, time) sibling: plain box predicate over the stored
    // z3-keyed layout; ZRangePruning injects the z3 range
    "geo_pruned_z3" -> ((s, d) => GeoOps.z3Layout(s, d)
      .where("lon >= -60 and lon <= 0 and lat >= -30 and lat <= 30 and t10 >= 300 and t10 <= 600")
      .select("event_id", "lon", "lat", "t10", "z3")),
    "geo_neighbor_pairs" -> ((s, d) => GeoOps.neighborPairs(s, d)),
    "geo_knn_join" -> ((s, d) => GeoOps.knnJoin(s, d)),
    "geo_triangle_counts" -> ((s, d) => GeoOps.triangleCounts(s, d)),
    "geo_pagerank" -> ((s, d) => GeoOps.pageRank(s, d)),
    "geo_bfs_hops" -> ((s, d) => GeoOps.bfsHops(s, d)),
    "geo_sssp" -> ((s, d) => GeoOps.sssp(s, d)),
    "geo_kcore" -> ((s, d) => GeoOps.kCore(s, d)),
    "geo_components" -> ((s, d) => GeoOps.connectedComponents(s, d)),
    "geo_ppr" -> ((s, d) => GeoOps.personalizedPageRank(s, d)),
    "geo_component_sizes" -> ((s, d) => GeoOps.componentSizes(s, d)),
    "geo_clustering_coeff" -> ((s, d) => GeoOps.clusteringCoefficient(s, d)),
    "geo_degree_histogram" -> ((s, d) => GeoOps.degreeHistogram(s, d)),
    "geo_link_prediction" -> ((s, d) => GeoOps.linkPrediction(s, d)),
    "geo_adamic_adar" -> ((s, d) => GeoOps.adamicAdar(s, d)),
    "geo_haversine_pairs" -> ((s, d) => GeoOps.haversinePairs(s, d)),
    "geo_geohash_keys" -> ((s, d) => GeoOps.geohashKeys(s, d)),
    "geo_grid_dbscan" -> ((s, d) => GeoOps.gridDbscan(s, d)),
    "geo_hotspots" -> ((s, d) => GeoOps.hotspots(s, d)),
    "xacid_zorder_scan" -> ((s, d) => GeoOps.zorderTxScan(s, d)),
  )

  private val coordsCte =
    """coords AS (
      |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
      |    (user_id * 37 + event_id * 11) % 360 - 180 AS lon,
      |    (event_id * 17 + user_id * 5) % 180 - 90 AS lat
      |  FROM events
      |)""".stripMargin

  private val scaledCte =
    """scaled AS (
      |  SELECT *, (lon + 180) * 65535 // 360 AS x, (lat + 90) * 65535 // 180 AS y
      |  FROM coords
      |)""".stripMargin

  /** Morton interleave as shift/mask arithmetic. */
  private def z2Sql(x: String, y: String): String =
    (0 until 16).map { i =>
      s"(($x >> $i) & 1) * ${1L << (2 * i)} + (($y >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")

  private def z3Sql(x: String, y: String, t: String): String =
    (0 until 10).map { i =>
      s"(($x >> $i) & 1) * ${1L << (3 * i)} + (($y >> $i) & 1) * ${1L << (3 * i + 1)} + (($t >> $i) & 1) * ${1L << (3 * i + 2)}"
    }.mkString("(", " + ", ")")

  private val (zMin, zMax) = {
    def sx(lon: Int) = (lon + 180) * 65535 / 360
    def sy(lat: Int) = (lat + 90) * 65535 / 180
    (GeoOps.zMorton(sx(-60), sy(-30)), GeoOps.zMorton(sx(0), sy(30)))
  }

  val oracles: Map[String, String] = Map(
    // full-lattice census incl. zero cells, bounded 9-offset contributor
    // join, one-row stats; the Gi* chain mirrors the Spark association
    // the z-order data-skipping contract: the file-pruned bbox probe must
    // see EXACTLY the rows a raw bbox filter sees (skip counts and the
    // linear-sort contrast are AcidSpec's half of the proof)
    "xacid_zorder_scan" -> {
      val (lonMin, lonMax, latMin, latMax) = GeoOps.ZTxBbox
      s"""WITH $coordsCte
         |SELECT CAST(count(*) AS BIGINT) AS n_events,
         |  min(lon) AS min_lon, max(lon) AS max_lon,
         |  min(lat) AS min_lat, max(lat) AS max_lat,
         |  CAST(sum(event_id) AS BIGINT) AS id_sum
         |FROM coords
         |WHERE lon BETWEEN $lonMin AND $lonMax
         |  AND lat BETWEEN $latMin AND $latMax""".stripMargin
    },
    "geo_hotspots" -> {
      val d = GeoOps.HotspotCellDeg
      val (nx, ny) = (360 / d, 180 / d)
      val meanSql = "CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)"
      val zSql =
        s"""(CAST(w_sum AS DOUBLE) - $meanSql * CAST(w_n AS DOUBLE)) /
           |    (sqrt(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) - $meanSql * ($meanSql)) *
           |     sqrt((CAST(n AS DOUBLE) * CAST(w_n AS DOUBLE) -
           |           CAST(w_n AS DOUBLE) * CAST(w_n AS DOUBLE)) /
           |          (CAST(n AS DOUBLE) - 1.0)))""".stripMargin
      s"""WITH $coordsCte,
         |counts AS (
         |  SELECT (lon + 180) // $d AS gx, (lat + 90) // $d AS gy,
         |    count(*) AS x
         |  FROM coords GROUP BY 1, 2),
         |lattice AS (
         |  SELECT gxs.gx, gys.gy
         |  FROM (SELECT unnest(range(0, $nx)) AS gx) gxs
         |  CROSS JOIN (SELECT unnest(range(0, $ny)) AS gy) gys),
         |cells AS (
         |  SELECT l.gx, l.gy, CAST(coalesce(c.x, 0) AS BIGINT) AS x
         |  FROM lattice l LEFT JOIN counts c ON c.gx = l.gx AND c.gy = l.gy),
         |stats AS (
         |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
         |    CAST(sum(x * x) AS BIGINT) AS sxx
         |  FROM cells),
         |offs AS (
         |  SELECT a.dx, b.dy FROM (VALUES (-1),(0),(1)) a(dx)
         |  CROSS JOIN (VALUES (-1),(0),(1)) b(dy)),
         |contrib AS (
         |  SELECT c.gx + o.dx AS gx, c.gy + o.dy AS gy,
         |    CAST(sum(c.x) AS BIGINT) AS w_sum, count(*) AS w_n
         |  FROM cells c CROSS JOIN offs o
         |  WHERE c.gx + o.dx >= 0 AND c.gx + o.dx < $nx
         |    AND c.gy + o.dy >= 0 AND c.gy + o.dy < $ny
         |  GROUP BY 1, 2)
         |SELECT c.gx, c.gy, c.x, ct.w_n, ct.w_sum,
         |  $zSql AS gi_z,
         |  CASE WHEN $zSql > 1.96 THEN 'hot'
         |       WHEN $zSql < -1.96 THEN 'cold'
         |       ELSE 'none' END AS spot
         |FROM cells c
         |JOIN contrib ct ON ct.gx = c.gx AND ct.gy = c.gy
         |CROSS JOIN stats""".stripMargin
    },
    "geo_z2_keys" ->
      s"""WITH $coordsCte, $scaledCte
         |SELECT event_id, lon, lat, x, y,
         |  CAST(${z2Sql("x", "y")} AS BIGINT) AS z2
         |FROM scaled""".stripMargin,
    "geo_z3_keys" ->
      s"""WITH $coordsCte,
         |z3c AS (
         |  SELECT event_id,
         |    (lon + 180) * 1023 // 360 AS x10,
         |    (lat + 90) * 1023 // 180 AS y10,
         |    (date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) // 3600) % 1024 AS t10
         |  FROM coords
         |)
         |SELECT event_id, x10, y10, t10,
         |  CAST(${z3Sql("x10", "y10", "t10")} AS BIGINT) AS z3
         |FROM z3c""".stripMargin,
    "geo_path_length" ->
      s"""WITH $coordsCte,
         |lagged AS (
         |  SELECT user_id, lon, lat,
         |    lag(lon) OVER w AS plon, lag(lat) OVER w AS plat
         |  FROM coords
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |),
         |segs AS (
         |  SELECT user_id,
         |    2 * 6371.0088 * asin(sqrt(
         |      pow(sin(radians(lat - plat) / 2), 2) +
         |      cos(radians(plat)) * cos(radians(lat)) *
         |        pow(sin(radians(lon - plon) / 2), 2))) AS seg_km
         |  FROM lagged WHERE plon IS NOT NULL
         |)
         |SELECT user_id, count(*) AS n_segments, sum(seg_km) AS path_km
         |FROM segs GROUP BY user_id""".stripMargin,
    "geo_bbox_filter" ->
      s"""WITH $coordsCte
         |SELECT event_id, lon, lat FROM coords
         |WHERE lon >= -60 AND lon <= 0 AND lat >= -30 AND lat <= 30""".stripMargin,
    "geo_pruned_bbox" ->
      s"""WITH $coordsCte, $scaledCte
         |SELECT event_id, lon, lat,
         |  CAST(${z2Sql("x", "y")} AS BIGINT) AS z2
         |FROM scaled
         |WHERE lon >= -60 AND lon <= 0 AND lat >= -30 AND lat <= 30""".stripMargin,
    "geo_pruned_z3" ->
      s"""WITH $coordsCte,
         |z3c AS (
         |  SELECT event_id, lon, lat,
         |    (lon + 180) * 1023 // 360 AS x10,
         |    (lat + 90) * 1023 // 180 AS y10,
         |    (date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) // 3600) % 1024 AS t10
         |  FROM coords
         |)
         |SELECT event_id, lon, lat, t10,
         |  CAST(${z3Sql("x10", "y10", "t10")} AS BIGINT) AS z3
         |FROM z3c
         |WHERE lon >= -60 AND lon <= 0 AND lat >= -30 AND lat <= 30
         |  AND t10 >= 300 AND t10 <= 600""".stripMargin,
    "geo_z2_range_scan" ->
      s"""WITH $coordsCte, $scaledCte,
         |zed AS (
         |  SELECT event_id, lon, lat,
         |    CAST(${z2Sql("x", "y")} AS BIGINT) AS z2
         |  FROM scaled
         |)
         |SELECT event_id, z2,
         |  (lon BETWEEN -60 AND 0 AND lat BETWEEN -30 AND 30) AS exact_match
         |FROM zed WHERE z2 BETWEEN $zMin AND $zMax""".stripMargin,
    // brute-force O(n²) recompute of the grid-bucket join's result — the
    // oracle is deliberately the quadratic plan the operator avoids
    "geo_neighbor_pairs" ->
      s"""WITH $coordsCte,
         |pts AS (SELECT event_id, lon, lat FROM coords WHERE user_id < 40)
         |SELECT a.event_id AS a_id, b.event_id AS b_id,
         |  a.lon AS a_lon, a.lat AS a_lat, b.lon AS b_lon, b.lat AS b_lat
         |FROM pts a JOIN pts b
         |  ON abs(a.lon - b.lon) <= 1 AND abs(a.lat - b.lat) <= 1
         |  AND a.event_id < b.event_id""".stripMargin,
    // same core-cell census, same 8-neighborhood graph, the ccSql
    // min-label + pointer-jump rounds replayed round-for-round on it —
    // bounded-round label semantics, all-integer, hash-exact
    "geo_grid_dbscan" -> {
      def round(i: Int) =
        s"""p$i AS (
           |  SELECT v, min(label) AS label FROM (
           |    SELECT und.dst AS v, l.label
           |    FROM und JOIN l${i - 1} l ON und.src = l.v
           |    UNION ALL SELECT v, label FROM l${i - 1})
           |  GROUP BY v),
           |l$i AS (
           |  SELECT a.v, b.label FROM p$i a JOIN p$i b ON b.v = a.label)""".stripMargin
      s"""WITH $coordsCte,
         |cells AS (
         |  SELECT lon, lat, CAST(count(*) AS BIGINT) AS n_points
         |  FROM coords GROUP BY 1, 2
         |  HAVING count(*) >= ${GeoOps.DbscanMinPts}),
         |cid AS (
         |  SELECT lon, lat, n_points,
         |    (lon + 180) * 1000 + (lat + 90) AS cell
         |  FROM cells),
         |und AS (
         |  SELECT a.cell AS src, b.cell AS dst FROM cid a JOIN cid b
         |  ON abs(a.lon - b.lon) <= 1 AND abs(a.lat - b.lat) <= 1
         |  AND a.cell <> b.cell),
         |l0 AS (SELECT cell AS v, cell AS label FROM cid),
         |${(1 to GeoOps.DbscanRounds).map(round).mkString(",\n")}
         |SELECT cid.lon, cid.lat, cid.n_points,
         |  l${GeoOps.DbscanRounds}.label AS cluster
         |FROM cid JOIN l${GeoOps.DbscanRounds} ON l${GeoOps.DbscanRounds}.v = cid.cell""".stripMargin
    },
    // same 15-bit integer scaling, the Morton interleave as shift/mask
    // arithmetic (lat even / lon odd — geohash leads with a lon bit), and
    // the same substr alphabet mapping — all integer/string ops, hash-exact
    "geo_geohash_keys" -> {
      val ghChars = (0 until 6).map { j =>
        s"substr('${GeoOps.GeohashAlphabet}', CAST(((gh30 >> ${25 - 5 * j}) & 31) AS INT) + 1, 1)"
      }.mkString(", ")
      s"""WITH $coordsCte,
         |sc AS (
         |  SELECT event_id, lon, lat,
         |    ((lon + 180) * 32768) // 360 AS lon15,
         |    ((lat + 90) * 32768) // 180 AS lat15
         |  FROM coords),
         |gh AS (
         |  SELECT event_id, lon, lat,
         |    CAST(${z2Sql("lat15", "lon15")} AS BIGINT) AS gh30
         |  FROM sc)
         |SELECT event_id, lon, lat, gh30, concat($ghChars) AS geohash
         |FROM gh""".stripMargin
    },
    // same candidate pairs, same IEEE haversine chain (identical
    // association order), 6 dp emission absorbs libm trig ulps
    "geo_haversine_pairs" ->
      s"""WITH $coordsCte,
         |pts AS (SELECT event_id, lon, lat FROM coords WHERE user_id < 40),
         |pairs AS (
         |  SELECT a.event_id AS a_id, b.event_id AS b_id,
         |    a.lon AS a_lon, a.lat AS a_lat, b.lon AS b_lon, b.lat AS b_lat
         |  FROM pts a JOIN pts b
         |    ON abs(a.lon - b.lon) <= 1 AND abs(a.lat - b.lat) <= 1
         |    AND a.event_id < b.event_id),
         |trig AS (
         |  SELECT *,
         |    sin(radians(CAST(b_lat - a_lat AS DOUBLE) / 2.0)) AS s1,
         |    sin(radians(CAST(b_lon - a_lon AS DOUBLE) / 2.0)) AS s2
         |  FROM pairs)
         |SELECT a_id, b_id, a_lon, a_lat, b_lon, b_lat,
         |  round(${GeoOps.EarthDiamKm} * asin(sqrt(
         |    s1 * s1 + cos(radians(CAST(a_lat AS DOUBLE))) *
         |      cos(radians(CAST(b_lat AS DOUBLE))) * (s2 * s2))), 6) AS km
         |FROM trig""".stripMargin,
    // same oriented-wedge closure in SQL over the same edge list
    "geo_triangle_counts" ->
      s"""WITH $coordsCte,
         |pts AS (SELECT event_id, lon, lat FROM coords WHERE user_id < 40),
         |edges AS (
         |  SELECT a.event_id AS a_id, b.event_id AS b_id
         |  FROM pts a JOIN pts b
         |    ON abs(a.lon - b.lon) <= 1 AND abs(a.lat - b.lat) <= 1
         |    AND a.event_id < b.event_id),
         |tri AS (
         |  SELECT e1.a_id AS a, e1.b_id AS b, e2.b_id AS c
         |  FROM edges e1 JOIN edges e2 ON e1.b_id = e2.a_id
         |  WHERE EXISTS (SELECT 1 FROM edges e3
         |                WHERE e3.a_id = e1.a_id AND e3.b_id = e2.b_id))
         |SELECT vertex, CAST(count(*) AS BIGINT) AS n_triangles
         |FROM (SELECT unnest([a, b, c]) AS vertex FROM tri)
         |GROUP BY vertex""".stripMargin,
    // degree histogram: undirected degrees rolled up, share one division
    "geo_degree_histogram" ->
      s"""WITH $coordsCte,
         |pts AS (SELECT event_id, lon, lat FROM coords WHERE user_id < 40),
         |edges AS (
         |  SELECT a.event_id AS a_id, b.event_id AS b_id
         |  FROM pts a JOIN pts b
         |    ON abs(a.lon - b.lon) <= 1 AND abs(a.lat - b.lat) <= 1
         |    AND a.event_id < b.event_id),
         |und AS (
         |  SELECT a_id AS src, b_id AS dst FROM edges
         |  UNION ALL
         |  SELECT b_id AS src, a_id AS dst FROM edges),
         |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
         |        FROM und GROUP BY src),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_vertices FROM deg)
         |SELECT deg, CAST(count(*) AS BIGINT) AS n_with_degree, n_vertices,
         |  CAST(count(*) AS DOUBLE) / n_vertices AS share
         |FROM deg, n GROUP BY deg, n_vertices""".stripMargin,
    // clustering coefficient: triangle counts joined to undirected degree,
    // one exact BIGINT division per vertex
    "geo_clustering_coeff" ->
      s"""WITH $coordsCte,
         |pts AS (SELECT event_id, lon, lat FROM coords WHERE user_id < 40),
         |edges AS (
         |  SELECT a.event_id AS a_id, b.event_id AS b_id
         |  FROM pts a JOIN pts b
         |    ON abs(a.lon - b.lon) <= 1 AND abs(a.lat - b.lat) <= 1
         |    AND a.event_id < b.event_id),
         |und AS (
         |  SELECT a_id AS src, b_id AS dst FROM edges
         |  UNION ALL
         |  SELECT b_id AS src, a_id AS dst FROM edges),
         |deg AS (SELECT src AS vertex, CAST(count(*) AS BIGINT) AS deg
         |        FROM und GROUP BY src),
         |tri AS (
         |  SELECT e1.a_id AS a, e1.b_id AS b, e2.b_id AS c
         |  FROM edges e1 JOIN edges e2 ON e1.b_id = e2.a_id
         |  WHERE EXISTS (SELECT 1 FROM edges e3
         |                WHERE e3.a_id = e1.a_id AND e3.b_id = e2.b_id)),
         |tcnt AS (
         |  SELECT vertex, CAST(count(*) AS BIGINT) AS n_triangles
         |  FROM (SELECT unnest([a, b, c]) AS vertex FROM tri)
         |  GROUP BY vertex)
         |SELECT d.vertex, d.deg,
         |  coalesce(t.n_triangles, 0) AS n_triangles,
         |  CAST(coalesce(t.n_triangles, 0) * 2 AS DOUBLE) /
         |    CAST(d.deg * (d.deg - 1) AS DOUBLE) AS clustering_coeff
         |FROM deg d LEFT JOIN tcnt t USING (vertex)
         |WHERE d.deg >= 2""".stripMargin,
    // brute-force unbucketed kNN: proves the 9-cell candidate set complete
    // within the radius; distances exact integers, ties break by b_id
    "geo_knn_join" -> {
      val r2 = GeoOps.KnnRadius * GeoOps.KnnRadius
      s"""WITH $coordsCte, $scaledCte,
         |pts AS (SELECT event_id, x, y FROM scaled WHERE user_id < 40),
         |cand AS (
         |  SELECT a.event_id AS a_id, b.event_id AS b_id,
         |    CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS d2
         |  FROM pts a JOIN pts b ON a.event_id <> b.event_id
         |  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= $r2)
         |SELECT a_id, b_id, d2 FROM (
         |  SELECT a_id, b_id, d2,
         |    row_number() OVER (PARTITION BY a_id ORDER BY d2, b_id) AS rn
         |  FROM cand)
         |WHERE rn <= ${GeoOps.KnnK}""".stripMargin
    },
    // same three unrolled integer rounds: 17/20 damping via floor division,
    // HUGEINT sums cast back to BIGINT, teleport exact (PrScale % 20 == 0)
    "geo_pagerank" -> {
      val tele = 3L * GeoOps.PrScale / 20L
      def round(i: Int) =
        s"""pr$i AS (
           |  SELECT dst AS v,
           |    CAST(sum((17 * pr) // (20 * deg)) AS BIGINT) + $tele AS pr
           |  FROM ed JOIN pr${i - 1} ON ed.src = pr${i - 1}.v
           |  GROUP BY dst)""".stripMargin
      s"""WITH $coordsCte,
         |pts AS (SELECT event_id, lon, lat FROM coords WHERE user_id < 40),
         |edges AS (
         |  SELECT a.event_id AS a_id, b.event_id AS b_id
         |  FROM pts a JOIN pts b
         |    ON abs(a.lon - b.lon) <= 1 AND abs(a.lat - b.lat) <= 1
         |    AND a.event_id < b.event_id),
         |und AS (
         |  SELECT a_id AS src, b_id AS dst FROM edges
         |  UNION ALL
         |  SELECT b_id AS src, a_id AS dst FROM edges),
         |deg AS (SELECT src, count(*) AS deg FROM und GROUP BY src),
         |ed AS (SELECT und.src, und.dst, deg.deg FROM und JOIN deg USING (src)),
         |pr0 AS (SELECT DISTINCT src AS v,
         |          CAST(${GeoOps.PrScale} AS BIGINT) AS pr FROM und),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT v, pr FROM pr3""".stripMargin
    },
    // union-of-rounds min(): r_k holds every vertex at distance exactly k
    // (plus possibly nearer ones) — min over hops is the BFS distance
    "geo_bfs_hops" -> {
      def round(i: Int) =
        s"""r$i AS (
           |  SELECT DISTINCT dst AS v FROM und JOIN r${i - 1} ON und.src = r${i - 1}.v)""".stripMargin
      s"""WITH $coordsCte,
         |pts AS (SELECT event_id, lon, lat FROM coords WHERE user_id < 40),
         |edges AS (
         |  SELECT a.event_id AS a_id, b.event_id AS b_id
         |  FROM pts a JOIN pts b
         |    ON abs(a.lon - b.lon) <= 1 AND abs(a.lat - b.lat) <= 1
         |    AND a.event_id < b.event_id),
         |und AS (
         |  SELECT a_id AS src, b_id AS dst FROM edges
         |  UNION ALL
         |  SELECT b_id AS src, a_id AS dst FROM edges),
         |r0 AS (SELECT DISTINCT src AS v FROM und
         |       WHERE src % ${GeoOps.BfsSeedMod} = 0),
         |${round(1)},
         |${round(2)},
         |${round(3)},
         |all_rounds AS (
         |  SELECT v, 0 AS hops FROM r0
         |  UNION ALL SELECT v, 1 FROM r1
         |  UNION ALL SELECT v, 2 FROM r2
         |  UNION ALL SELECT v, 3 FROM r3)
         |SELECT v, CAST(min(hops) AS BIGINT) AS hops
         |FROM all_rounds GROUP BY v""".stripMargin
    },
    // unrolled Bellman–Ford: d_k = min(d_{k-1}, relax(d_{k-1})) — exact
    // integer weights 1 + |Δlon| + |Δlat|, so min() replays bit-for-bit
    "geo_sssp" -> {
      def round(i: Int) =
        s"""r$i AS (
           |  SELECT dst AS v, min(d + w) AS d
           |  FROM und JOIN d${i - 1} ON und.src = d${i - 1}.v GROUP BY dst),
           |d$i AS (
           |  SELECT v, CAST(min(d) AS BIGINT) AS d FROM (
           |    SELECT v, d FROM d${i - 1} UNION ALL SELECT v, d FROM r$i)
           |  GROUP BY v)""".stripMargin
      s"""WITH $coordsCte,
         |pts AS (SELECT event_id, lon, lat FROM coords WHERE user_id < 40),
         |edges AS (
         |  SELECT a.event_id AS a_id, b.event_id AS b_id,
         |    CAST(1 + abs(a.lon - b.lon) + abs(a.lat - b.lat) AS BIGINT) AS w
         |  FROM pts a JOIN pts b
         |    ON abs(a.lon - b.lon) <= 1 AND abs(a.lat - b.lat) <= 1
         |    AND a.event_id < b.event_id),
         |und AS (
         |  SELECT a_id AS src, b_id AS dst, w FROM edges
         |  UNION ALL
         |  SELECT b_id AS src, a_id AS dst, w FROM edges),
         |d0 AS (SELECT DISTINCT src AS v, CAST(0 AS BIGINT) AS d FROM und
         |       WHERE src % ${GeoOps.BfsSeedMod} = 0),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT v, d FROM d3""".stripMargin
    },
    // unrolled peeling: e_i = e_{i-1} restricted to endpoints whose degree
    // in e_{i-1} is >= K — pure integer counts, replays bit-for-bit
    "geo_kcore" -> {
      def round(i: Int) =
        s"""k$i AS (
           |  SELECT src AS v FROM e${i - 1}
           |  GROUP BY src HAVING count(*) >= ${GeoOps.KcoreK}),
           |e$i AS (
           |  SELECT e.src, e.dst FROM e${i - 1} e
           |  JOIN k$i a ON e.src = a.v JOIN k$i b ON e.dst = b.v)""".stripMargin
      s"""WITH $coordsCte,
         |pts AS (SELECT event_id, lon, lat FROM coords WHERE user_id < 40),
         |edges AS (
         |  SELECT a.event_id AS a_id, b.event_id AS b_id
         |  FROM pts a JOIN pts b
         |    ON abs(a.lon - b.lon) <= 1 AND abs(a.lat - b.lat) <= 1
         |    AND a.event_id < b.event_id),
         |e0 AS (
         |  SELECT a_id AS src, b_id AS dst FROM edges
         |  UNION ALL
         |  SELECT b_id AS src, a_id AS dst FROM edges),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT src AS v, CAST(count(*) AS BIGINT) AS deg
         |FROM e${GeoOps.KcoreRounds} GROUP BY src""".stripMargin
    },
    // personalized PR: per round the inflow shares and the seed teleports
    // sum in ONE grouped union — only positive-mass vertices survive, the
    // locality the Spark side's frontier join exploits
    "geo_ppr" -> {
      val tele = 3L * GeoOps.PrScale / 20L
      def round(i: Int) =
        s"""p$i AS (
           |  SELECT v, CAST(sum(x) AS BIGINT) AS pr FROM (
           |    SELECT dst AS v, (17 * pr) // (20 * deg) AS x
           |    FROM ed JOIN p${i - 1} ON ed.src = p${i - 1}.v
           |    UNION ALL
           |    SELECT v, $tele AS x FROM seeds)
           |  GROUP BY v HAVING sum(x) > 0)""".stripMargin
      s"""WITH $coordsCte,
         |pts AS (SELECT event_id, lon, lat FROM coords WHERE user_id < 40),
         |edges AS (
         |  SELECT a.event_id AS a_id, b.event_id AS b_id
         |  FROM pts a JOIN pts b
         |    ON abs(a.lon - b.lon) <= 1 AND abs(a.lat - b.lat) <= 1
         |    AND a.event_id < b.event_id),
         |und AS (
         |  SELECT a_id AS src, b_id AS dst FROM edges
         |  UNION ALL
         |  SELECT b_id AS src, a_id AS dst FROM edges),
         |deg AS (SELECT src, count(*) AS deg FROM und GROUP BY src),
         |ed AS (SELECT und.src, und.dst, deg.deg FROM und JOIN deg USING (src)),
         |seeds AS (SELECT DISTINCT src AS v FROM und
         |          WHERE src % ${GeoOps.BfsSeedMod} = 0),
         |p0 AS (SELECT v, CAST(${GeoOps.PrScale} AS BIGINT) AS pr FROM seeds),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT v, pr, (v % ${GeoOps.BfsSeedMod} = 0) AS is_seed FROM p3""".stripMargin
    },
    // unrolled min-label propagation + pointer-jump shortcut: p_i is the
    // 1-hop min over l_{i-1}, l_i re-points every label at ITS label
    // (labels are vertex ids, min-monotone, so the shortcut join is total)
    "geo_components" -> ccSql("SELECT v, label FROM l" + GeoOps.CcRounds),
    "geo_component_sizes" -> ccSql(
      s"""SELECT label AS component, CAST(count(*) AS BIGINT) AS n_vertices
         |FROM l${GeoOps.CcRounds} GROUP BY label""".stripMargin),
    // wedge self-join on the pivot, pair count, ANTI join keeps non-edges;
    // jaccard one IEEE division of exact BIGINTs, cut on the integer count
    "geo_link_prediction" ->
      s"""WITH $coordsCte,
         |pts AS (SELECT event_id, lon, lat FROM coords WHERE user_id < 40),
         |edges AS (
         |  SELECT a.event_id AS a_id, b.event_id AS b_id
         |  FROM pts a JOIN pts b
         |    ON abs(a.lon - b.lon) <= 1 AND abs(a.lat - b.lat) <= 1
         |    AND a.event_id < b.event_id),
         |und AS (
         |  SELECT a_id AS src, b_id AS dst FROM edges
         |  UNION ALL
         |  SELECT b_id AS src, a_id AS dst FROM edges),
         |deg AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS deg
         |        FROM und GROUP BY src),
         |cn AS (
         |  SELECT e1.dst AS a, e2.dst AS b, CAST(count(*) AS BIGINT) AS common
         |  FROM und e1 JOIN und e2 ON e1.src = e2.src AND e1.dst < e2.dst
         |  GROUP BY e1.dst, e2.dst),
         |ne AS (
         |  SELECT cn.* FROM cn
         |  LEFT JOIN und ON und.src = cn.a AND und.dst = cn.b
         |  WHERE und.src IS NULL)
         |SELECT a, b, common, da.deg AS deg_a, db.deg AS deg_b,
         |  CAST(common AS DOUBLE) / CAST(da.deg + db.deg - common AS DOUBLE)
         |    AS jaccard
         |FROM ne JOIN deg da ON da.v = ne.a JOIN deg db ON db.v = ne.b
         |ORDER BY common DESC, a, b
         |LIMIT ${GeoOps.LinkPredK}""".stripMargin,
    // same wedge stream weighted by 1/ln(deg(pivot)); anchored log kernel
    // (r11): the term uses the DetLog chain quantized to the 1e12 grid so
    // the per-pair sum is exact; the cut orders on the ROUNDED score
    "geo_adamic_adar" ->
      s"""WITH $coordsCte,
         |pts AS (SELECT event_id, lon, lat FROM coords WHERE user_id < 40),
         |edges AS (
         |  SELECT a.event_id AS a_id, b.event_id AS b_id
         |  FROM pts a JOIN pts b
         |    ON abs(a.lon - b.lon) <= 1 AND abs(a.lat - b.lat) <= 1
         |    AND a.event_id < b.event_id),
         |und AS (
         |  SELECT a_id AS src, b_id AS dst FROM edges
         |  UNION ALL
         |  SELECT b_id AS src, a_id AS dst FROM edges),
         |deg AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS deg
         |        FROM und GROUP BY src),
         |aa AS (
         |  SELECT e1.dst AS a, e2.dst AS b, CAST(count(*) AS BIGINT) AS common,
         |    round(CAST(sum(CAST(round(((1.0::DOUBLE /
         |        ${graft.functions.DetLog.lnSql("dm.deg")}) *
         |      (1000000000000.0::DOUBLE)), 0) AS BIGINT)) AS DOUBLE) /
         |      (1000000000000.0::DOUBLE), 6) AS aa_score
         |  FROM und e1 JOIN und e2 ON e1.src = e2.src AND e1.dst < e2.dst
         |  JOIN deg dm ON dm.v = e1.src
         |  GROUP BY e1.dst, e2.dst),
         |ne AS (
         |  SELECT aa.* FROM aa
         |  LEFT JOIN und ON und.src = aa.a AND und.dst = aa.b
         |  WHERE und.src IS NULL)
         |SELECT a, b, common, aa_score
         |FROM ne
         |ORDER BY aa_score DESC, a, b
         |LIMIT ${GeoOps.LinkPredK}""".stripMargin,
  )

  private def ccSql(finalSelect: String): String = {
    def round(i: Int) =
      s"""p$i AS (
         |  SELECT v, min(label) AS label FROM (
         |    SELECT und.dst AS v, l.label
         |    FROM und JOIN l${i - 1} l ON und.src = l.v
         |    UNION ALL SELECT v, label FROM l${i - 1})
         |  GROUP BY v),
         |l$i AS (
         |  SELECT a.v, b.label FROM p$i a JOIN p$i b ON b.v = a.label)""".stripMargin
    s"""WITH $coordsCte,
       |pts AS (SELECT event_id, lon, lat FROM coords WHERE user_id < 40),
       |edges AS (
       |  SELECT a.event_id AS a_id, b.event_id AS b_id
       |  FROM pts a JOIN pts b
       |    ON abs(a.lon - b.lon) <= 1 AND abs(a.lat - b.lat) <= 1
       |    AND a.event_id < b.event_id),
       |und AS (
       |  SELECT a_id AS src, b_id AS dst FROM edges
       |  UNION ALL
       |  SELECT b_id AS src, a_id AS dst FROM edges),
       |l0 AS (SELECT DISTINCT src AS v, src AS label FROM und),
       |${(1 to GeoOps.CcRounds).map(round).mkString(",\n")}
       |$finalSelect""".stripMargin
  }
}

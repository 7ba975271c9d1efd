"""Geospatial query plans (r13): the location lane an event-analytics
warehouse runs — geohash encoding, cell-blocked radius joins, and grid
density rollups. Coordinates are synthesized deterministically per
user from the house md5-uniform scheme (the sensor-twin contract:
hex32(md5(key)) both engines replay digit-for-digit), held in
MICRO-DEGREES as exact integers; every per-row computation is pure
integer shift/mask/div arithmetic, so the oracles replay bit-for-bit.
Planar small-angle distance (squared micro-degree metric) is used
rather than haversine — trig doubles are not cross-engine exact, and
the thing that matters at 100 TB is the JOIN SHAPE: radius search is a
bounded 9-cell equi-join (hub side broadcast), never an all-pairs
cross join, and density is one keyed aggregate.

Reference provenance: the reference engine has no geospatial lane —
this is beyond-reference surface (SURVEY §2 additive lanes) in the
spirit of its place-processing scripts (OLD/process_place.py), which
handled locations as opaque strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datalake_etlscripts_spark.io.readers import read_table
from datalake_etlscripts_spark.plans.registry import ddb_hex32, query

_GH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _coord_cols():
    """(lat_micro, lon_micro) Spark columns for a user_id column —
    deterministic micro-degree coordinates in [-90e6, 90e6] /
    [-180e6, 180e6] from the md5-uniform scheme."""
    lat = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":lat"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 180000001
        - 90000000
    )
    lon = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":lon"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 360000001
        - 180000000
    )
    return lat.alias("lat_micro"), lon.alias("lon_micro")


_DDB_LAT = (
    ddb_hex32("md5(CAST(user_id AS VARCHAR) || ':lat')")
    + " % 180000001 - 90000000"
)
_DDB_LON = (
    ddb_hex32("md5(CAST(user_id AS VARCHAR) || ':lon')")
    + " % 360000001 - 180000000"
)


# ---------------------------------------------------------------------------
# Geohash encode: 20 bisection bits per axis in closed form (one
# integer multiply-divide replaces 20 halvings), interleaved
# lon-first per the geohash spec into a 40-bit integer, read out as 8
# base-32 characters. Pure per-row integer arithmetic — no shuffle at
# all beyond the distinct-user aggregate; at 100 TB this is a scan.
# ---------------------------------------------------------------------------
def _interleave_terms(lon_var: str, lat_var: str) -> str:
    """SQL: Σ bits — even positions (MSB-first) from lon, odd from
    lat, matching the geohash spec."""
    terms = []
    for k in range(40):
        if k % 2 == 0:
            src, bit = lon_var, 19 - k // 2
        else:
            src, bit = lat_var, 19 - (k - 1) // 2
        terms.append(f"((({src} >> {bit}) & 1) << {39 - k})")
    return " + ".join(terms)


def _gh_chars_sql(gh_var: str) -> str:
    return " || ".join(
        f"substr('{_GH_ALPHABET}', CAST((({gh_var} >> {35 - 5 * i}) & 31)"
        " + 1 AS INT), 1)"
        for i in range(8)
    )


@query(
    "geohash_encode",
    oracle=f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    c AS (
      SELECT user_id,
             CAST({_DDB_LAT} AS BIGINT) AS lat_micro,
             CAST({_DDB_LON} AS BIGINT) AS lon_micro
      FROM u
    ),
    q AS (
      -- spec divisors (exact 180/360 degrees); the poles/antimeridian
      -- land in the top bucket via the clamp, as canonical geohash does
      SELECT user_id, lat_micro, lon_micro,
             least((lat_micro + 90000000) * 1048576 // 180000000, 1048575)
               AS latq,
             least((lon_micro + 180000000) * 1048576 // 360000000, 1048575)
               AS lonq
      FROM c
    ),
    g AS (
      SELECT user_id, lat_micro, lon_micro,
             {_interleave_terms("lonq", "latq")} AS gh_int
      FROM q
    )
    SELECT user_id, lat_micro, lon_micro,
           CAST(gh_int AS BIGINT) AS gh_int,
           {_gh_chars_sql("gh_int")} AS geohash
    FROM g
    """,
)
def q_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-character geohash per user from deterministic micro-degree coordinates - closed-form 20-bit axis quantization, spec bit interleave (lon first), base-32 readout; pure per-row integer arithmetic over the distinct-user table."""
    u = read_table(spark, sf_dir, "events").select("user_id").distinct()
    c = u.select("user_id", *_coord_cols())
    q = c.select(
        "user_id",
        "lat_micro",
        "lon_micro",
        F.expr(
            "least((lat_micro + 90000000) * 1048576 div 180000000, 1048575)"
        ).alias("latq"),
        F.expr(
            "least((lon_micro + 180000000) * 1048576 div 360000000, 1048575)"
        ).alias("lonq"),
    )
    gh_int = F.expr(_interleave_terms("lonq", "latq"))
    g = q.select("user_id", "lat_micro", "lon_micro", gh_int.alias("gh_int"))
    # substr with a computed start needs expr() — build the 8-char
    # readout from the same generator as the oracle
    geohash = F.expr(_gh_chars_sql("gh_int"))
    return g.select(
        "user_id",
        "lat_micro",
        "lon_micro",
        F.col("gh_int").cast("long").alias("gh_int"),
        geohash.alias("geohash"),
    )


# ---------------------------------------------------------------------------
# Radius join: events within 5° of each of 8 deterministic hubs. The
# scale shape is the whole point: both sides land in C=R-sized grid
# cells on SHIFTED (non-negative) coordinates — truncating division
# agrees across engines only above zero — the hub side explodes to
# its 9 neighbor cells (any point within R of a hub lies in one of
# them), and candidates come from a broadcast equi-join on the cell
# key. Exact integer squared-distance verify. Never all-pairs: the
# fan-out is the 8×9 hub-cell dim, the fact table takes one scan.
# ---------------------------------------------------------------------------
_RADIUS = 5_000_000  # micro-degrees


@query(
    "geo_radius_join",
    oracle=f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    c AS (
      SELECT user_id,
             CAST({_DDB_LAT} AS BIGINT) + 90000000 AS lat_s,
             CAST({_DDB_LON} AS BIGINT) + 180000000 AS lon_s
      FROM u
    ),
    ev AS (
      SELECT e.user_id, c.lat_s, c.lon_s,
             c.lat_s // {_RADIUS} AS clat, c.lon_s // {_RADIUS} AS clon
      FROM events e JOIN c USING (user_id)
    ),
    hubs AS (
      SELECT h.h AS hub_id,
             CAST({ddb_hex32("md5('hub:' || CAST(h.h AS VARCHAR) || ':lat')")}
                  % 180000001 AS BIGINT) AS hlat_s,
             CAST({ddb_hex32("md5('hub:' || CAST(h.h AS VARCHAR) || ':lon')")}
                  % 360000001 AS BIGINT) AS hlon_s
      FROM range(0, 8) h(h)
    ),
    hcells AS (
      SELECT hub_id, hlat_s, hlon_s,
             hlat_s // {_RADIUS} + d1.d AS clat,
             hlon_s // {_RADIUS} + d2.d AS clon
      FROM hubs, range(-1, 2) d1(d), range(-1, 2) d2(d)
    ),
    cand AS (
      SELECT h.hub_id, e.user_id,
             (e.lat_s - h.hlat_s) * (e.lat_s - h.hlat_s)
             + (e.lon_s - h.hlon_s) * (e.lon_s - h.hlon_s) AS d2
      FROM ev e JOIN hcells h USING (clat, clon)
    )
    SELECT hub_id,
           CAST(count(*) FILTER (WHERE d2 <= {_RADIUS}::BIGINT * {_RADIUS})
                AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id)
                  FILTER (WHERE d2 <= {_RADIUS}::BIGINT * {_RADIUS})
                AS BIGINT) AS n_users
    FROM cand GROUP BY hub_id
    """,
)
def q_geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events within 5 degrees of 8 deterministic hub points via R-sized grid-cell blocking - hub side explodes to its 9 neighbor cells and broadcasts, candidates come from a cell equi-join, membership is an exact integer squared-distance check; the fact table takes one scan, never an all-pairs join."""
    e = read_table(spark, sf_dir, "events").select("user_id")
    u = e.distinct().select(
        "user_id",
        *_coord_cols(),
    )
    c = u.select(
        "user_id",
        (F.col("lat_micro") + 90000000).alias("lat_s"),
        (F.col("lon_micro") + 180000000).alias("lon_s"),
    )
    ev = (
        read_table(spark, sf_dir, "events")
        .select("user_id")
        .join(c, "user_id")
        .select(
            "user_id",
            "lat_s",
            "lon_s",
            F.expr(f"lat_s div {_RADIUS}").alias("clat"),
            F.expr(f"lon_s div {_RADIUS}").alias("clon"),
        )
    )
    hubs = spark.range(8).select(
        F.col("id").alias("hub_id"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("hub:"), F.col("id").cast("string"),
                            F.lit(":lat"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 180000001
        ).alias("hlat_s"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("hub:"), F.col("id").cast("string"),
                            F.lit(":lon"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 360000001
        ).alias("hlon_s"),
    )
    deltas = F.array([F.lit(d) for d in (-1, 0, 1)])
    hcells = (
        hubs.withColumn("d1", F.explode(deltas))
        .withColumn("d2x", F.explode(deltas))
        .select(
            "hub_id",
            "hlat_s",
            "hlon_s",
            (F.expr(f"hlat_s div {_RADIUS}") + F.col("d1")).alias("clat"),
            (F.expr(f"hlon_s div {_RADIUS}") + F.col("d2x")).alias("clon"),
        )
    )
    r2 = F.lit(_RADIUS).cast("long") * _RADIUS
    d2 = (F.col("lat_s") - F.col("hlat_s")) * (
        F.col("lat_s") - F.col("hlat_s")
    ) + (F.col("lon_s") - F.col("hlon_s")) * (F.col("lon_s") - F.col("hlon_s"))
    cand = ev.join(F.broadcast(hcells), ["clat", "clon"]).select(
        "hub_id", "user_id", d2.alias("d2")
    )
    within = F.col("d2") <= r2
    return cand.groupBy("hub_id").agg(
        F.sum(F.when(within, 1).otherwise(0)).cast("long").alias("n_events"),
        F.count_distinct(F.when(within, F.col("user_id")))
        .cast("long")
        .alias("n_users"),
    )


# ---------------------------------------------------------------------------
# Grid density: 1° cells over the shifted plane, event count +
# distinct users per cell, densest 20 cells with a total-order
# tiebreak. One keyed aggregate + a top-k window on the (bounded)
# cell table — the standard heat-map rollup.
# ---------------------------------------------------------------------------
@query(
    "geo_grid_density",
    oracle=f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    c AS (
      SELECT user_id,
             (CAST({_DDB_LAT} AS BIGINT) + 90000000) // 1000000 AS cell_lat,
             (CAST({_DDB_LON} AS BIGINT) + 180000000) // 1000000 AS cell_lon
      FROM u
    ),
    d AS (
      SELECT c.cell_lat, c.cell_lon,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
      FROM events e JOIN c USING (user_id)
      GROUP BY 1, 2
    ),
    r AS (
      SELECT *, row_number() OVER
               (ORDER BY n_events DESC, cell_lat, cell_lon) AS rk
      FROM d
    )
    SELECT cell_lat, cell_lon, n_events, n_users, CAST(rk AS INT) AS rk
    FROM r WHERE rk <= 20
    """,
)
def q_geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densest 20 one-degree grid cells by event count (with distinct users) - one keyed aggregate to the bounded cell table, then a top-k window with a deterministic total-order tiebreak."""
    u = (
        read_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select("user_id", *_coord_cols())
        .select(
            "user_id",
            F.expr("(lat_micro + 90000000) div 1000000").alias("cell_lat"),
            F.expr("(lon_micro + 180000000) div 1000000").alias("cell_lon"),
        )
    )
    d = (
        read_table(spark, sf_dir, "events")
        .select("user_id")
        .join(u, "user_id")
        .groupBy("cell_lat", "cell_lon")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
        )
    )
    wr = W.orderBy(
        F.col("n_events").desc(), F.col("cell_lat"), F.col("cell_lon")
    )
    return (
        d.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 20)
        .select(
            "cell_lat", "cell_lon", "n_events", "n_users",
            F.col("rk").cast("int").alias("rk"),
        )
    )


# ---------------------------------------------------------------------------
# Trajectory statistics: per-EVENT coordinates (keyed on event_id —
# users move), ordered per user by time, planar step distances
# floor(sqrt(dlat² + dlon²)). IEEE-754 sqrt is correctly rounded, so
# unlike trig it IS cross-engine exact on exact integer inputs; each
# step floors independently to an integer before the order-free sum.
# One keyed window per user — the standard movement rollup, no
# fact-sized global sort.
# ---------------------------------------------------------------------------
_DDB_ELAT = (
    ddb_hex32("md5(CAST(event_id AS VARCHAR) || ':lat')")
    + " % 180000001 - 90000000"
)
_DDB_ELON = (
    ddb_hex32("md5(CAST(event_id AS VARCHAR) || ':lon')")
    + " % 360000001 - 180000000"
)


@query(
    "geo_trajectory_stats",
    oracle=f"""
    WITH c AS (
      SELECT user_id, ts, event_id,
             CAST({_DDB_ELAT} AS BIGINT) AS lat,
             CAST({_DDB_ELON} AS BIGINT) AS lon
      FROM events
    ),
    s AS (
      SELECT user_id, lat, lon,
             lag(lat) OVER w AS plat, lag(lon) OVER w AS plon
      FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    st AS (
      SELECT user_id,
             CAST(floor(sqrt(CAST((lat - plat) * (lat - plat)
                  + (lon - plon) * (lon - plon) AS DOUBLE))) AS BIGINT)
               AS step
      FROM s WHERE plat IS NOT NULL
    )
    SELECT user_id,
           CAST(count(*) + 1 AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_steps,
           CAST(sum(step) AS BIGINT) AS total_dist,
           CAST(max(step) AS BIGINT) AS max_step
    FROM st GROUP BY user_id
    """,
)
def q_geo_trajectory_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trajectory statistics over per-event deterministic coordinates - time-ordered lag window per user, planar step distance floor(sqrt(.)) (IEEE sqrt is correctly rounded, hence cross-engine exact on integer inputs), order-free integer sums."""
    e = read_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("event_id").cast("string"), F.lit(":lat")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 180000001
            - 90000000
        ).alias("lat"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("event_id").cast("string"), F.lit(":lon")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 360000001
            - 180000000
        ).alias("lon"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "user_id",
        "lat",
        "lon",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
    ).filter(F.col("plat").isNotNull())
    step = F.floor(
        F.sqrt(
            (
                (F.col("lat") - F.col("plat")) * (F.col("lat") - F.col("plat"))
                + (F.col("lon") - F.col("plon"))
                * (F.col("lon") - F.col("plon"))
            ).cast("double")
        )
    ).cast("long")
    return (
        s.select("user_id", step.alias("step"))
        .groupBy("user_id")
        .agg(
            (F.count(F.lit(1)) + 1).cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_steps"),
            F.sum("step").cast("long").alias("total_dist"),
            F.max("step").cast("long").alias("max_step"),
        )
    )


# ---------------------------------------------------------------------------
# Grid-DBSCAN (cell variant): density-based spatial clustering at the
# grid grain — core cells are 10° cells holding ≥ 3 events, clusters
# are connected components of 8-adjacent core cells (the grid-grain
# form of DBSCAN used when per-point ε-joins would be unbounded).
# Scale shape: one keyed aggregate to the ≤648-cell table, a bounded
# 8-neighbor explode + equi-join for edges, then the O(log n)
# large-star/small-star CC operator the dedup lane already ships.
# Oracle: recursive min-label CTE over the same bounded cell graph.
# ---------------------------------------------------------------------------
_DB_CELL = 10_000_000  # 10° cells
_DB_MINPTS = 3


@query(
    "geo_dbscan_cells",
    oracle=f"""
    WITH RECURSIVE c AS (
      SELECT (CAST({_DDB_ELAT} AS BIGINT) + 90000000) // {_DB_CELL} AS clat,
             (CAST({_DDB_ELON} AS BIGINT) + 180000000) // {_DB_CELL} AS clon
      FROM events
    ),
    cells AS (
      SELECT clat, clon, clat * 37 + clon AS cell_id,
             CAST(count(*) AS BIGINT) AS n_points
      FROM c GROUP BY 1, 2 HAVING count(*) >= {_DB_MINPTS}
    ),
    edges AS (
      SELECT a.cell_id AS src, b.cell_id AS dst
      FROM cells a JOIN cells b
        ON abs(a.clat - b.clat) <= 1 AND abs(a.clon - b.clon) <= 1
       AND a.cell_id <> b.cell_id
    ),
    reach(node, lab) AS (
      SELECT cell_id, cell_id FROM cells
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp AS (SELECT node, min(lab) AS component FROM reach GROUP BY node)
    SELECT CAST(p.component AS BIGINT) AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(c.n_points) AS BIGINT) AS n_points,
           CAST(min(c.clat) AS BIGINT) AS min_clat,
           CAST(max(c.clat) AS BIGINT) AS max_clat,
           CAST(min(c.clon) AS BIGINT) AS min_clon,
           CAST(max(c.clon) AS BIGINT) AS max_clon
    FROM comp p JOIN cells c ON c.cell_id = p.node
    GROUP BY 1
    """,
)
def q_geo_dbscan_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-DBSCAN spatial clustering: 10-degree core cells (>= 3 events) connected through 8-adjacency into clusters via the large-star/small-star CC operator - one keyed aggregate to the bounded cell table, bounded neighbor explode for edges, singleton cores kept as their own clusters."""
    from datalake_etlscripts_spark.operators.dedup import (
        connected_components_star,
    )

    e = read_table(spark, sf_dir, "events").select(
        "event_id",
        (
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("event_id").cast("string"),
                                F.lit(":lat"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % 180000001
                - 90000000
                + 90000000
            )
        ).alias("lat_s"),
        (
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("event_id").cast("string"),
                                F.lit(":lon"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % 360000001
                - 180000000
                + 180000000
            )
        ).alias("lon_s"),
    )
    cells = (
        e.select(
            F.expr(f"lat_s div {_DB_CELL}").alias("clat"),
            F.expr(f"lon_s div {_DB_CELL}").alias("clon"),
        )
        .groupBy("clat", "clon")
        .agg(F.count(F.lit(1)).cast("long").alias("n_points"))
        .filter(F.col("n_points") >= _DB_MINPTS)
        .withColumn("cell_id", F.col("clat") * 37 + F.col("clon"))
    )
    # bounded 8-neighbor fan-out of the ≤648-row core-cell dim
    deltas = [(da, dc) for da in (-1, 0, 1) for dc in (-1, 0, 1)
              if (da, dc) != (0, 0)]
    nbrs = cells.select(
        F.col("cell_id").alias("src"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("clat") + da).alias("nlat"),
                        (F.col("clon") + dc).alias("nlon"),
                    )
                    for da, dc in deltas
                ]
            )
        ).alias("nb"),
    ).select("src", (F.col("nb.nlat") * 37 + F.col("nb.nlon")).alias("dst"))
    pairs = nbrs.join(
        F.broadcast(cells.select(F.col("cell_id").alias("dst"))), "dst"
    ).select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
    comp = connected_components_star(pairs)
    labeled = cells.join(
        F.broadcast(comp.withColumnRenamed("node", "cell_id")),
        "cell_id",
        "left",
    ).withColumn("component", F.coalesce("component", "cell_id"))
    return labeled.groupBy(
        F.col("component").cast("long").alias("cluster_id")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("n_points").cast("long").alias("n_points"),
        F.min("clat").cast("long").alias("min_clat"),
        F.max("clat").cast("long").alias("max_clat"),
        F.min("clon").cast("long").alias("min_clon"),
        F.max("clon").cast("long").alias("max_clon"),
    )


# ---------------------------------------------------------------------------
# Origin-destination flows (r13): consecutive-event transitions
# between 30° grid cells per user — the movement-flow matrix behind
# migration/commute dashboards. One keyed lag window (the trajectory
# shape) then one aggregate to the bounded cell-pair table; top-20
# flows with a total-order tiebreak. Self-transitions kept (they ARE
# the diagonal a flow dashboard shows).
# ---------------------------------------------------------------------------
@query(
    "geo_od_flows",
    oracle=f"""
    WITH c AS (
      SELECT user_id, ts, event_id,
             (CAST({_DDB_ELAT} AS BIGINT) + 90000000) // 30000000 AS clat,
             (CAST({_DDB_ELON} AS BIGINT) + 180000000) // 30000000 AS clon
      FROM events
    ),
    s AS (
      SELECT user_id, clat, clon,
             lag(clat) OVER w AS plat, lag(clon) OVER w AS plon
      FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    f AS (
      SELECT plat * 13 + plon AS from_cell, clat * 13 + clon AS to_cell,
             CAST(count(*) AS BIGINT) AS n_moves,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM s WHERE plat IS NOT NULL GROUP BY 1, 2
    ),
    r AS (
      SELECT *, row_number() OVER
               (ORDER BY n_moves DESC, from_cell, to_cell) AS rk
      FROM f
    )
    SELECT CAST(from_cell AS BIGINT) AS from_cell,
           CAST(to_cell AS BIGINT) AS to_cell,
           n_moves, n_users, CAST(rk AS INT) AS rk
    FROM r WHERE rk <= 20
    """,
)
def q_geo_od_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 origin-destination flows between 30-degree grid cells from consecutive per-user events - one keyed lag window, one aggregate to the bounded cell-pair table, deterministic total-order ranking; self-transitions kept as the diagonal."""
    e = read_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.expr(
            "(CAST(conv(substring(md5(concat(CAST(event_id AS STRING), "
            "':lat')), 1, 8), 16, 10) AS BIGINT) % 180000001) div 30000000"
        ).alias("clat"),
        F.expr(
            "(CAST(conv(substring(md5(concat(CAST(event_id AS STRING), "
            "':lon')), 1, 8), 16, 10) AS BIGINT) % 360000001) div 30000000"
        ).alias("clon"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "user_id",
        "clat",
        "clon",
        F.lag("clat").over(w).alias("plat"),
        F.lag("clon").over(w).alias("plon"),
    ).filter(F.col("plat").isNotNull())
    f = s.groupBy(
        (F.col("plat") * 13 + F.col("plon")).alias("from_cell"),
        (F.col("clat") * 13 + F.col("clon")).alias("to_cell"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_moves"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
    )
    wr = W.orderBy(
        F.col("n_moves").desc(), F.col("from_cell"), F.col("to_cell")
    )
    return (
        f.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 20)
        .select(
            F.col("from_cell").cast("long").alias("from_cell"),
            F.col("to_cell").cast("long").alias("to_cell"),
            "n_moves",
            "n_users",
            F.col("rk").cast("int").alias("rk"),
        )
    )

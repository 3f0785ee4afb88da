"""Shared literal specs for driver queries and their DuckDB oracles.

Every constant that appears on BOTH sides of the correctness gate (the Spark
query and the DuckDB oracle SQL) is defined exactly once here and embedded as
a full-precision literal, so the two sides can only diverge through genuine
algorithmic differences — never through copy-paste drift.

Deterministic geo derivation: the driver's testdata has no lat/lng column, so
queries derive one from ``event_id`` using *exact integer arithmetic* (a
Lehmer LCG step, then scaled-integer degrees).  Both engines compute identical
doubles: integer ops are exact and the final divide-by-1000 is a single IEEE
op.  No transcendentals in the derivation path.
"""

from __future__ import annotations

import math

import numpy as np

# ---------------------------------------------------------------------------
# Lat/lng derivation from event_id (exact in both engines)
# ---------------------------------------------------------------------------

LCG_A = 48271
LCG_C = 11
LCG_M = 2147483647  # 2^31 - 1


def latlng_sql(id_col: str = "event_id") -> tuple[str, str]:
    """SQL fragments (lat, lng) — valid in both Spark SQL and DuckDB.

    The divisor is CAST to DOUBLE: Spark parses a bare ``1000.0`` literal as
    DECIMAL(5,1) and would produce an exact-rational DECIMAL lat/lng column,
    which double-rounds DIFFERENTLY (once, from the exact value) than the
    IEEE chain numpy and DuckDB execute (divide-round then subtract-round) —
    up to 2 ulp apart on a small fraction of ids.  With the cast, all three
    engines run the identical double op sequence and agree bit-for-bit,
    which order-independent-exact aggregates (min/max bbox in
    s2_cluster_stats) rely on."""
    x1 = f"(({id_col} * {LCG_A} + {LCG_C}) % {LCG_M})"
    x2 = f"(({x1} * {LCG_A} + {LCG_C}) % {LCG_M})"
    lat = f"(({x1} % 170001) / CAST(1000.0 AS DOUBLE) - 85.0)"
    lng = f"(({x2} % 360000) / CAST(1000.0 AS DOUBLE) - 180.0)"
    return lat, lng


def latlng_np(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Same derivation in numpy (for brute-force reference computations)."""
    ids = np.asarray(ids, dtype=np.int64)
    x1 = (ids * LCG_A + LCG_C) % LCG_M
    x2 = (x1 * LCG_A + LCG_C) % LCG_M
    lat = (x1 % 170001) / 1000.0 - 85.0
    lng = (x2 % 360000) / 1000.0 - 180.0
    return lat, lng


def f(v: float) -> str:
    """Full-precision double literal (round-trips exactly in both engines)."""
    return repr(float(v))


# Within-distance self-join radius (radians, ~89 km): strictly below
# MIN_WIDTH.value(6) = 0.01473 so level-6 Moore adjacency is complete, and
# measured >= 1e-6 RELATIVE margin from every event-pair chord2 at
# sf0.001/0.01/0.1 (no pair sits near the threshold at double precision).
DISTANCE_JOIN_RADIUS = 0.014

# DBSCAN minPts: a point is CORE when its eps-ball (eps =
# DISTANCE_JOIN_RADIUS) holds >= this many points INCLUDING itself (Ester
# et al. 1996 count the query point).  4 — the paper's recommended 2-D
# default — yields a real three-way split at the sf0.01 gate (410 core /
# 274 border / 9316 noise) while sf0.001's sparse graph (max degree 1)
# exercises the all-noise degenerate branch.
DBSCAN_MINPTS = 4

# Focal-density grid level: level-4 tiles (6*256 = 1,536 cells) keep the
# per-tile counts dense enough at the sf0.01 gate (~6.5 events/tile) that
# the edge-neighbor focal sums are non-trivial everywhere on the sphere.
FOCAL_LEVEL = 4

# Geo-balanced sampler: keep this many events per FOCAL_LEVEL tile (the
# training-mix cap that stops dense cities from dominating the corpus).
GEO_SAMPLE_K = 3

# Cell-disk (kRing) query: grid level and ring radius.  Level 6 matches the
# distance join's adjacency level (6*4^6 = 24,576 cells — still grid-bounded);
# 3 rings is the H3 gridDiskDistances-style neighborhood a feature join pulls.
DISK_LEVEL = 6
DISK_K = 3

# Cell-union compaction (the H3 compactCells analog): leaf level of the
# occupied-tile set.  Level 6 shares the cell-disk counts table; at gate
# density a meaningful fraction of level-5 parents are complete, so the
# compaction genuinely climbs the tree.
COMPACT_LEVEL = 6

# Tile pyramid (multi-resolution rollup): emit counts at these levels, each
# tile with its share of its parent (the level two above is the pyramid
# parent — quadtree zoom steps of 2).  Leaf level must equal COMPACT_LEVEL
# so the pyramid shares the session grid-counts table.
PYRAMID_LEVELS = (0, 2, 4, 6)

# Near-dup doc clustering: MinHash candidate pairs at or above this
# estimated Jaccard are dup edges; connected components over them define
# the dup clusters (canonical doc = component minimum doc_id).
DEDUP_SIM_THRESHOLD = 0.5


# ---------------------------------------------------------------------------
# Query regions (all literals; centers also embedded in oracle SQL)
# ---------------------------------------------------------------------------


def _unit_xyz(lat_deg: float, lng_deg: float) -> tuple[float, float, float]:
    la, ln = math.radians(lat_deg), math.radians(lng_deg)
    return (math.cos(la) * math.cos(ln), math.cos(la) * math.sin(ln), math.sin(la))


def _chord2(radius_deg: float) -> float:
    # cap.rs:108-110: squared chord for an angular radius.
    s = math.sin(0.5 * math.radians(radius_deg))
    return 4.0 * s * s


# (region_id, lat, lng, radius_deg) — mix of hot (over city blobs in synthetic
# docs) and cold caps, plus a polar one.
CAPS = [
    ("cap_sf", 37.7749, -122.4194, 3.0),
    ("cap_nyc", 40.7128, -74.0060, 2.0),
    ("cap_tokyo", 35.6762, 139.6503, 4.0),
    ("cap_pacific", -10.0, -150.0, 15.0),
    ("cap_polar", 88.0, 0.0, 5.0),
]


def cap_rows() -> list[tuple[str, float, float, float, float]]:
    """(region_id, cx, cy, cz, radius2) with centers/radii as exact doubles."""
    out = []
    for rid, lat, lng, r in CAPS:
        cx, cy, cz = _unit_xyz(lat, lng)
        out.append((rid, cx, cy, cz, _chord2(r)))
    return out


# (region_id, lat_lo, lng_lo, lat_hi, lng_hi); rect_dateline crosses ±180.
RECTS = [
    ("rect_bayarea", 36.5, -123.5, 39.0, -121.0),
    ("rect_europe", 35.0, -10.0, 60.0, 30.0),
    ("rect_dateline", -20.0, 170.0, 10.0, -160.0),
    ("rect_antarctic", -90.0, -180.0, -60.0, 180.0),
]

# Convex CCW spherical polygons as lat/lng vertex rings (degrees).
POLYGONS = [
    ("poly_diamond_us", [(30.0, -100.0), (40.0, -85.0), (50.0, -100.0), (40.0, -115.0)]),
    ("poly_pentagon_sa", [(-30.0, -70.0), (-25.0, -55.0), (-10.0, -50.0), (-5.0, -65.0), (-15.0, -75.0)]),
    ("poly_quad_asia", [(20.0, 95.0), (15.0, 120.0), (40.0, 130.0), (45.0, 100.0)]),
]

PIP_MARGIN = 1e-12  # exclude points this close to an edge plane (both sides)

# Deeply nested polygon (country > lake > island > pond), all rings CCW and
# convex; polygon interior = points inside an ODD number of rings
# (polygon.rs:140-161 parity convention).
# Coastline-scale region: a 512-vertex convex ring (geodesic polygon
# inscribed in a 25-degree small circle).  Exercises the per-face edge
# index covering path end-to-end; convexity keeps the edge-sign oracle
# valid.  Vertices are generated here (pure math) so the Spark loop and
# the DuckDB oracle share the exact same double literals.
COASTLINE_ID = "poly_coastline"
COASTLINE_CENTER = (40.0, -100.0)
COASTLINE_RADIUS_DEG = 25.0
COASTLINE_N = 512


def coastline_vertices_xyz() -> list[tuple[float, float, float]]:
    clat, clng = (math.radians(d) for d in COASTLINE_CENTER)
    c = (math.cos(clat) * math.cos(clng), math.cos(clat) * math.sin(clng), math.sin(clat))
    east = (-math.sin(clng), math.cos(clng), 0.0)
    north = (
        -math.sin(clat) * math.cos(clng),
        -math.sin(clat) * math.sin(clng),
        math.cos(clat),
    )
    r = math.radians(COASTLINE_RADIUS_DEG)
    cr, sr = math.cos(r), math.sin(r)
    out = []
    for k in range(COASTLINE_N):
        t = 2.0 * math.pi * k / COASTLINE_N
        ct, st = math.cos(t), math.sin(t)
        out.append(
            (
                cr * c[0] + sr * (ct * east[0] + st * north[0]),
                cr * c[1] + sr * (ct * east[1] + st * north[1]),
                cr * c[2] + sr * (ct * east[2] + st * north[2]),
            )
        )
    return out


# Overlay operand pair (convex CCW rings, overlapping at a corner): the
# engine builds union/intersection/difference polygons from these via the
# boolean overlay kernel; the oracle re-derives membership as boolean
# algebra of per-ring edge-sign tests.
OVERLAY_A = [(0.0, 0.0), (0.0, 25.0), (25.0, 25.0), (25.0, 0.0)]
OVERLAY_B = [(12.0, 12.0), (12.0, 38.0), (38.0, 38.0), (38.0, 12.0)]

NESTED_POLYGON_ID = "poly_nested_country"
NESTED_RINGS = [
    [(0.0, 0.0), (0.0, 40.0), (40.0, 40.0), (40.0, 0.0)],
    [(10.0, 10.0), (10.0, 30.0), (30.0, 30.0), (30.0, 10.0)],
    [(15.0, 15.0), (15.0, 25.0), (25.0, 25.0), (25.0, 15.0)],
    [(18.0, 18.0), (18.0, 22.0), (22.0, 22.0), (22.0, 18.0)],
]


def polygon_vertices_xyz(ring: list[tuple[float, float]]) -> list[tuple[float, float, float]]:
    return [_unit_xyz(la, ln) for la, ln in ring]


# kNN query points: (query_id, lat, lng); k below.
KNN_QUERIES = [
    ("q_sf", 37.7, -122.4),
    ("q_london", 51.5, -0.1),
    ("q_sydney", -33.9, 151.2),
    ("q_equator", 0.0, 0.0),
    ("q_southpole", -89.0, 10.0),
    ("q_tokyo", 35.7, 139.7),
]
KNN_K = 5

# Polyline for segment-distance queries (kNN-to-edge kernel): lat/lng vertices.
POLYLINE = [(35.0, -120.0), (40.0, -100.0), (38.0, -85.0), (42.0, -70.0)]


POLYLINE_BUFFER_DEG = 1.5


def polyline_segments_xyz() -> list[tuple[tuple[float, float, float], tuple[float, float, float]]]:
    pts = [_unit_xyz(la, ln) for la, ln in POLYLINE]
    return [(pts[i], pts[i + 1]) for i in range(len(pts) - 1)]


# ---------------------------------------------------------------------------
# Text-pipeline constants
# ---------------------------------------------------------------------------

EMBED_DEDUP_TAU = 0.35  # calibrated: yields a non-trivial pair set at sf0.01

FP_MOD = 1000000007
FP_MULT = 31

# Skew caps for the text-dedup joins (absolute, part of the operator
# semantics — the oracles replay them).  A gram shared by > NGRAM_DF_CAP
# docs is a stop-gram: it contributes O(df^2) candidate pairs while carrying
# no near-dup signal, so it is dropped from the inverted index AND from the
# per-doc gram counts (Jaccard is defined over non-stop grams).  An LSH band
# bucket holding > LSH_BUCKET_CAP docs is a near-identical template cluster:
# it would emit O(cap^2) pairs per bucket per band; such clusters belong to
# exact/simhash dedup, so the bucket is dropped whole.  Both caps are far
# above anything the test corpora produce (max gram df = 25, max bucket =
# 12 at sf0.1), so small-SF results are unchanged; at 100 TB they bound the
# worst bucket's pair count at 10^4 / 4x10^3 instead of corpus-quadratic.
NGRAM_DF_CAP = 100
LSH_BUCKET_CAP = 64

# Stopword markers for the language-scoring heuristic (space-padded substring
# counting — replace-arithmetic identical in both engines).
LANG_MARKERS = [
    ("en", ["the", "and", "of"]),
    ("de", ["der", "und", "die"]),
    ("es", ["el", "la", "de"]),
    ("fr", ["le", "la", "et"]),
]

PUNCT_CHARS = ".,!?;:"
VOWELS = "aeiou"

# doc_quality stopword set (padded-substring counting, same trick as
# LANG_MARKERS) + the flag thresholds.  Thresholds chosen where the synthetic
# corpus actually splits (sf0.01 quantiles: distinct-ratio median 0.46,
# stop-hit median 3, vowel-ratio IQR 0.278-0.294, token p05 = 16) so the
# keep/drop decision is non-trivial at every SF.
QUALITY_STOPWORDS = ["the", "and", "of", "a"]
QUALITY_LEN_MIN, QUALITY_LEN_MAX = 20, 400
QUALITY_STOP_MIN = 3
QUALITY_DISTINCT_MIN = 0.45
QUALITY_VOWEL_MIN, QUALITY_VOWEL_MAX = 0.27, 0.31

# s2_colocation_join: two different users' events within COLOC_RADIUS and
# within this time window (microseconds — the events table carries
# microsecond timestamps, so the delta is an exact integer in every engine).
# Radius is 3x the distance-join epsilon and the window 72 h: the LCG ties
# nearby event ids to nearby timestamps, so tighter bounds leave the small
# SFs empty (measured: min diff-user dt at sf0.001 is 23.5 days inside 1x).
COLOC_WINDOW_US = 259_200_000_000  # 72 h
COLOC_RADIUS = 3.0 * DISTANCE_JOIN_RADIUS  # 0.042 rad, ~267 km

# s2_od_matrix: origin/destination tile level for consecutive-step flows.
OD_LEVEL = 4

# s2_step_midpoint: tile level for the resampled trajectory midpoints.
MID_LEVEL = 10

# s2_tile_churn: tile level for the temporal occupancy diff.  Level 6 keeps
# the grid sparse at the gate SFs (24,576 cells vs 10k events at sf0.01) so
# all three statuses (new / gone / stable) occur.
CHURN_LEVEL = 6

# s2_speed_filter: band edges in degrees of arc per hour, applied to the
# 6-dp-rounded speed.  Measured on the LCG trajectories (median ~11 deg/h at
# every SF): <= 15 keeps ~55% "plausible", 15-50 ~30% "fast", > 50 (or a
# zero time delta) ~15% "anomalous" — all three bands non-trivial at every
# gate SF.
SPEED_PLAUSIBLE_DEG_H = 15.0
SPEED_MAX_DEG_H = 50.0

# s2_waypoints: interior slerp fractions per trajectory step (k = 1..3).
WAYPOINT_TS = [0.25, 0.5, 0.75]

# s2_traj_simplify: Douglas-Peucker tolerance in radians.  The LCG
# trajectories are global random walks (median step ~11 deg), so a
# real-map tolerance would drop nothing; 1.2 rad keeps ~56-59% of vertices
# at every gate SF (measured 0.588 / 0.564 / 0.56x at sf0.001/0.01/0.1) —
# both classes non-trivial everywhere.
SIMPLIFY_TOL_RAD = 1.2

# s2_traj_jaccard: trajectory-overlap similarity join over occupied
# level-6 tile sets.  TRAJ_TILE_CAP is the stop-tile skew cap (the
# NGRAM_DF_CAP analog): tiles visited by more distinct users than this are
# non-discriminative and would cost O(users^2) in the self-join; overlap is
# defined over the discriminative tiles.  200 binds only in sf1's hot tail
# (measured users/tile: sf1 p99 = 165, max = 250; sf0.1 max = 33), so the
# cap is exercised by the sf1 gate without perturbing smaller SFs.
TRAJ_JACCARD_LEVEL = 6
TRAJ_TILE_CAP = 200

# s2_self_intersect: trajectory self-crossing detection.  Candidate pairs
# are steps of the SAME user at sequence gap 2..W (gap 1 shares an endpoint;
# gap > W is out of the loop-detection window), generated by a banded
# self-join on (user_id, seq div W) — each left step is emitted into its own
# block and the next, which is COMPLETE for gap <= W (floor(sj/W) -
# floor(si/W) is 0 or 1), so the band is pure optimization and the oracle
# may use the semantically-equal direct gap join.  Work is O(n * W) at any
# scale.  W = 16 is ~1/4 of a trajectory (users hold ~66 events at every
# SF), keeping the detector local-loop-shaped while exercising both block
# cases.
SELF_INTERSECT_W = 16

# s2_stay_points: stop/dwell detection — maximal runs of consecutive slow
# steps (the gaps-and-islands twin of sessionize, keyed on speed instead of
# time gap).  The threshold is compared against the same 6-dp ROUNDED speed
# the already-gated s2_speed_filter emits (identical op tree, so the
# cross-engine story is inherited, not re-argued).  8.0 deg/h sits below
# the ~11 deg/h median LCG step speed: ~39% of steps are slow at every SF,
# yielding plentiful islands with a non-trivial multi-step population
# (measured islands / multi-step: 250/92 at sf0.001, 2,356/955 at sf0.01,
# 23,566/9,165 at sf0.1).
STAY_SPEED_DEG_H = 8.0

# Determinacy band for the self-intersection sign tests.  Both segments are
# trig-derived, and the sf1 replication's LCG lattice produces EXACTLY
# collinear step triples (arithmetic progressions in (lat, lng) are
# point-reflection symmetric through the shared great circle), whose sign
# products are true zeros computed as ~1e-17 noise — engine-UNSTABLE under
# a strict > 0 test.  A proper crossing must clear this band instead (the
# relational twin of simple_crossing returning "uncertain" for degenerate
# input and deferring to exact predicates, edge_crossings.rs).  Measured
# gap: computed |product| on exact-touch pairs <= 4.8e-17 (4 pairs, sf1
# only), minimum GENUINE |product| = 8.2e-07 / 1.8e-10 / 1.4e-09 / 4.9e-12
# at sf0.001/0.01/0.1/1 — 1e-13 sits ~2 orders from both populations, and
# product noise (~1e-15 absolute) can never carry a value across it.
SELF_INTERSECT_EPS = 1e-13

# doc_keyterms: top-K distinctive terms per document.  K=3 keeps the output
# doc-bounded while still exercising the full rank window (docs have ~30
# distinct terms at every SF, so rank 3 is never vacuous).
KEYTERMS_K = 3

# s2_hotspot: a tile is "hot" when its focal density sits this many standard
# deviations above the occupied-grid mean (Getis-Ord-style z threshold).
# 1.5 yields non-empty hot AND non-hot classes at every gate SF (the LCG's
# uniform-in-degrees lat concentrates points per unit area toward the poles,
# so the z spread is real, not noise).
HOTSPOT_Z = 1.5

# s2_moran: global + local Moran's I spatial autocorrelation over the
# FOCAL_LEVEL tile counts with rook (FACE_WRAP edge-neighbor) binary
# weights restricted to OCCUPIED tiles.  All intermediates are exact
# bigints — the scaled deviation D_i = N*x_i - S (N tiles, S total count)
# clears the x̄ = S/N rational without any division; the N² scale cancels
# in the I ratio.  The emitted statistic is floor(1e6 * I) over a
# mirrored double chain (floor of a bit-identical double is engine-exact
# for ANY value — no round()-halfway hazard, the class the sf1 gate caught
# in the containment ratios).

# s2_ripley_k: point-pattern K function at these fractions of
# DISTANCE_JOIN_RADIUS, counted from the memoized epsilon-graph pairs (the
# chord2_r values the gate already proves engine-identical).  1.0 makes
# the largest bucket the full pair set; the smaller fractions give real
# radial structure at every gate SF.
RIPLEY_FRACTIONS = (0.5, 0.75, 1.0)

# doc_bigrams: corpus-level collocation extraction — top-K consecutive
# word pairs by exact rational PMI lift (c_xy*N_tok)/(c_x*c_y), no log().
# MIN_COUNT screens hapax pairs (lift of a count-1 pair is pure noise);
# K bounds the output at any corpus size.
BIGRAM_MIN_COUNT = 5
BIGRAM_K = 100

# s2_tile_diversity: Gini-Simpson user diversity per FOCAL_LEVEL tile —
# the probability two random events in a tile come from DIFFERENT users,
# 1 - sum(c_u^2)/n^2 = (n^2 - sum(c_u^2))/n^2: a pure rational (no log()),
# emitted with the exact integer half-up idiom.  The curation signal that
# separates organically busy tiles from single-user spam columns.

# s2_idw_smooth: inverse-distance-weighted smoothing on the S2 grid —
# each occupied tile's count re-estimated from its rook-BFS ring-1/ring-2
# neighbors (self excluded) with integer weights ring1 -> 2, ring2 -> 1,
# so the estimate num/den is a pure rational and the 6-dp emission is the
# exact integer half-up division.  The raster-algebra "focal mean with a
# distance kernel" analog, and the residual against the observed count is
# the anomaly signal.
IDW_W1 = 2
IDW_W2 = 1

# s2_decay_density: exponential time-decay density per FOCAL_LEVEL tile.
# Age buckets of HALF_LIFE microseconds (2 days — the 30-day corpus spans
# ~15 buckets, so the decay curve is non-trivial at every gate SF); the
# weight is the EXACT bigint 2^(BMAX - min(bucket, BMAX)), so the decayed
# mass num = sum(weights) is exact and decayed = num / 2^BMAX emits via
# the integer half-up idiom — exponential decay with zero floating point.
# BMAX = 20 keeps 2e6 * num inside int64 at sf1 (num <= n_events * 2^20).
DECAY_HALF_LIFE_US = 2 * 24 * 3600 * 1_000_000
DECAY_BMAX = 20

# s2_voronoi_assign hubs: deterministic "facility" points (major-city
# lat/lngs) whose Voronoi cells partition the sphere.  Exact-double unit
# vectors via the same _unit_xyz path the caps use; K is intentionally
# larger than CAPS so the argmin chain is non-trivial.
HUBS = [
    ("hub_sfo", 37.6213, -122.3790),
    ("hub_nyc", 40.7128, -74.0060),
    ("hub_lon", 51.5074, -0.1278),
    ("hub_gru", -23.5558, -46.6396),
    ("hub_jnb", -26.2041, 28.0473),
    ("hub_dxb", 25.2048, 55.2708),
    ("hub_del", 28.6139, 77.2090),
    ("hub_sin", 1.3521, 103.8198),
    ("hub_tyo", 35.6762, 139.6503),
    ("hub_syd", -33.8688, 151.2093),
    ("hub_anc", 61.2181, -149.9003),
    ("hub_scott", -77.8460, 166.6760),
]


def hub_rows() -> list[tuple[int, str, float, float, float]]:
    """(hub_idx, hub_id, cx, cy, cz) with centers as exact doubles."""
    out = []
    for idx, (hid, lat, lng) in enumerate(HUBS):
        cx, cy, cz = _unit_xyz(lat, lng)
        out.append((idx, hid, cx, cy, cz))
    return out


def voronoi_dist_sql(x: str = "x", y: str = "y", z: str = "z") -> list[str]:
    """Per-hub squared-chord SQL fragments over unit-xyz columns — the same
    text is embedded on both engines, so the IEEE op trees are identical."""
    dists = []
    for _, _, cx, cy, cz in hub_rows():
        a = f"({x} - ({f(cx)}))"
        b = f"({y} - ({f(cy)}))"
        c = f"({z} - ({f(cz)}))"
        dists.append(f"({a}*{a} + {b}*{b} + {c}*{c})")
    return dists


def voronoi_pick_sql(dcols: list[str], best: str = "best") -> str:
    """ARGmin as the FIRST hub index attaining the least() minimum
    (deterministic tie-break by index — the numpy argmin convention)."""
    whens = " ".join(f"WHEN {d} = {best} THEN {i}" for i, d in enumerate(dcols[:-1]))
    return f"(CASE {whens} ELSE {len(dcols) - 1} END)"


# ---------------------------------------------------------------------------
# Raster -> vector (s2_vectorize): mask variants + cube-face edge topology
# ---------------------------------------------------------------------------

# (variant, level, hot): "occ" vectorizes the occupied-tile footprint at a
# coarse level (near-global at sf>=0.01 -- the boundary is the holes);
# "hot" vectorizes the hotspot mask (tiles holding >= 2x the mean per-tile
# count), a scattered archipelago.  Both derive from ONE distributed rollup
# at the finer level: occ = the parent set of the occupied fine tiles,
# hot = the fine tiles over the threshold.
VECTORIZE_VARIANTS = (("occ", 4, False), ("hot", 5, True))

# Distributed vectorize (s2_vectorize_dist): the level-12+ scale path
# (engine/vectorize_dist.boundary_rings) gets its own oracled query.  The
# mask is the level-VECTORIZE_DIST_LEVEL tiles occupied by events inside a
# lat/lng window, DILATED by their 4 edge neighbors (FACE_WRAP topology) —
# plus-shaped blobs that merge into connected regions, corner-touch
# (pinches), and cross face borders (the window straddles the face-0/face-2
# edge at lat 45).  VECTORIZE_DIST_SCALE turns ring-vertex coordinates
# into reorder-proof scaled-integer checksums: corner coords use only
# IEEE-exact ops (+,*,/,sqrt), so Spark/numpy and DuckDB produce
# bit-identical doubles when the op order is mirrored.
VECTORIZE_DIST_LEVEL = 11
VECTORIZE_DIST_BOX = (20.0, 60.0, -40.0, 40.0)  # lat_lo, lat_hi, lng_lo, lng_hi
VECTORIZE_DIST_SCALE = 1000000000.0
# sub-face stitch partitioning: 6*4^B groups instead of 6 (the ring output
# is invariant to B — tests prove identity across block levels)
VECTORIZE_DIST_BLOCKS = 4

# Cube-face edge-adjacency transforms for level-L tiles in (face, ti, tj)
# coordinates, with n = 2^L.  For a tile whose edge-neighbor step leaves
# [0, n) on its face, FACE_WRAP[(face, dir)] = (nf, ti', tj') gives the
# neighbor on the adjacent face; dir is 0=down(tj-1) 1=right(ti+1)
# 2=up(tj+1) 3=left(ti-1); "T" is the surviving coordinate along the shared
# edge (ti for dirs 0/2, tj for dirs 1/3), "N1" = n-1, "N1-T" = n-1-T.
# This is the cube topology that from_face_ij_wrap (kernel/hierarchy.py:312,
# cellid.rs:115-132) computes geometrically; tests/test_vectorize.py proves
# the table equal to the kernel for every (face, dir, T) at two levels.
FACE_WRAP = {
    (0, 0): (5, "T", "N1"),   (0, 1): (1, "0", "T"),
    (0, 2): (2, "0", "N1-T"), (0, 3): (4, "N1-T", "N1"),
    (1, 0): (5, "N1", "N1-T"), (1, 1): (3, "N1-T", "0"),
    (1, 2): (2, "T", "0"),    (1, 3): (0, "N1", "T"),
    (2, 0): (1, "T", "N1"),   (2, 1): (3, "0", "T"),
    (2, 2): (4, "0", "N1-T"), (2, 3): (0, "N1-T", "N1"),
    (3, 0): (1, "N1", "N1-T"), (3, 1): (5, "N1-T", "0"),
    (3, 2): (4, "T", "0"),    (3, 3): (2, "N1", "T"),
    (4, 0): (3, "T", "N1"),   (4, 1): (5, "0", "T"),
    (4, 2): (0, "0", "N1-T"), (4, 3): (2, "N1-T", "N1"),
    (5, 0): (3, "N1", "N1-T"), (5, 1): (1, "N1-T", "0"),
    (5, 2): (0, "T", "0"),    (5, 3): (4, "N1", "T"),
}

"""Distributed raster->vector boundary stitching (the level-12+ scale path).

``cellunion_boundary`` (kernel/vectorize.py) stitches on the driver — sound
while the mask is grid-bounded at coarse levels, but a level-12+ footprint
has a perimeter of millions of edges.  This module keeps every
perimeter-proportional step distributed:

  1. boundary-edge extraction: batched edge-neighbor expansion + one
     LEFT ANTI join against the mask (no geometry yet — pure cellid math);
  2. edge geometry: corners via the same batched kernel math as
     cellunion_boundary (bit-identical corner keys);
  3. per-face stitch: groupBy(face).applyInPandas — each face's edges
     stitch into (a) rings fully interior to the face and (b) open CHAINS
     cut at face-border nodes.  Border nodes are cut points because the
     most-sharply-left continuation rule needs ALL edges at a node, and a
     border node's edges can live on two faces;
  4. driver linking: only the chain ENDPOINT summaries come to the driver
     (O(chains), not O(perimeter)); chains are paired at border nodes with
     the same most-sharply-left rule and linked into cross-face rings;
  5. ring assembly: a broadcast (chain_id -> ring_id, seq offset) map turns
     the distributed chain-vertex rows into final ring rows — ring vertices
     never pass through the driver.

Output rings are interior-left oriented (shells CCW, holes CW), identical
to the driver stitch — proven ring-for-ring in tests/test_vectorize_dist.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernel import hierarchy as h
from ..kernel import hilbert, stuv
from ..kernel.vectorize import _corner_key, _turn_ccw  # noqa: F401 (key parity)

_GEOM_SCHEMA = (
    "face int, skey string, ekey string, s_border boolean, e_border boolean, "
    "ax double, ay double, az double, bx double, by double, bz double"
)

_STITCH_SCHEMA = (
    "kind string, rid string, seq long, x double, y double, z double, "
    "skey string, ekey string, px double, py double, pz double, "
    "sx double, sy double, sz double"
)


def _key_str(p: np.ndarray) -> str:
    """String form of the kernel's _corner_key rounding (exact: repr of the
    rounded doubles round-trips).  ``+ 0.0`` folds -0.0 into +0.0 — the
    kernel's tuple keys compare them equal, strings would not."""
    return "|".join(repr(v) for v in np.round(p, 14) + 0.0)


def _key_floats(key: str) -> np.ndarray:
    return np.array([float(v) for v in key.split("|")])


def _tile_corners(tiles: np.ndarray, level: int):
    """Batched Cell.vertex replication (the cellunion_boundary math):
    face, (n, 4, 3) unit corners CCW from the uv-lo corner, and per-corner
    face-border flags (|u| == 1 or |v| == 1 — exact at the grid extremes,
    st_to_uv(0) = -1 and st_to_uv(1) = 1 are closed-form)."""
    ids_arr = tiles.astype(np.uint64)
    f, i, j, _ = hilbert.cellid_to_face_ij_orientation(ids_arr)
    cs = np.int64(h.size_ij(level))
    x_lo = i.astype(np.int64) & -cs
    y_lo = j.astype(np.int64) & -cs
    u_lo = stuv.st_to_uv(stuv.ij_to_stmin(x_lo))
    u_hi = stuv.st_to_uv(stuv.ij_to_stmin(x_lo + cs))
    v_lo = stuv.st_to_uv(stuv.ij_to_stmin(y_lo))
    v_hi = stuv.st_to_uv(stuv.ij_to_stmin(y_lo + cs))
    fi = f.astype(np.int64)
    corners, borders = [], []
    for cu_, cv_ in ((u_lo, v_lo), (u_hi, v_lo), (u_hi, v_hi), (u_lo, v_hi)):
        x, y, z = stuv.face_uv_to_xyz(fi, cu_, cv_)
        nn = np.sqrt(x * x + y * y + z * z)
        corners.append(np.stack([x / nn, y / nn, z / nn], axis=-1))
        borders.append((np.abs(cu_) == 1.0) | (np.abs(cv_) == 1.0))
    return fi, np.stack(corners, axis=1), np.stack(borders, axis=1)


def _boundary_edges(tiles_df: DataFrame) -> DataFrame:
    """(tile, k) rows for every cell edge whose neighbor is outside the
    mask.  Distributed: batched neighbor expansion, one LEFT ANTI join."""

    def expand(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            t = pdf["tile"].to_numpy(dtype=np.int64)
            nbrs = np.asarray(
                h.edge_neighbors(t.view(np.uint64)), dtype=np.uint64
            ).view(np.int64)
            n = len(t)
            yield pd.DataFrame(
                {
                    "tile": np.repeat(t, 4),
                    "k": np.tile(np.arange(4, dtype=np.int32), n),
                    "nbr": nbrs.reshape(-1),
                }
            )

    cand = tiles_df.select("tile").mapInPandas(
        expand, schema="tile long, k int, nbr long"
    )
    inside = tiles_df.select(F.col("tile").alias("nbr"))
    return cand.join(inside, on="nbr", how="left_anti").select("tile", "k")


def _edge_geometry(bd_df: DataFrame, level: int) -> DataFrame:
    """Boundary (tile, k) -> directed edge geometry + corner keys + border
    flags, batched with the exact cellunion_boundary corner math."""

    def geom(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            t = pdf["tile"].to_numpy(dtype=np.int64)
            k = pdf["k"].to_numpy(dtype=np.int64)
            fi, corners, borders = _tile_corners(t, level)
            rows = np.arange(len(t))
            a = corners[rows, k]
            b = corners[rows, (k + 1) & 3]
            yield pd.DataFrame(
                {
                    "face": fi.astype(np.int32),
                    "skey": [_key_str(p) for p in a],
                    "ekey": [_key_str(p) for p in b],
                    "s_border": borders[rows, k],
                    "e_border": borders[rows, (k + 1) & 3],
                    "ax": a[:, 0], "ay": a[:, 1], "az": a[:, 2],
                    "bx": b[:, 0], "by": b[:, 1], "bz": b[:, 2],
                }
            )

    return bd_df.mapInPandas(geom, schema=_GEOM_SCHEMA)


def _emit_ring(out_rows: list, verts: list, keys: list) -> None:
    """Normalize a closed ring (first vertex NOT repeated) to start at its
    smallest corner key and emit vertex rows."""
    rot = min(range(len(keys)), key=lambda i: keys[i])
    n = len(verts)
    # the min key alone can collide: two rings touching at a corner node can
    # both have it as their min — the outgoing edge (min -> next) is unique
    rid = "R:" + keys[rot] + ">" + keys[(rot + 1) % n]
    for s in range(n):
        p = verts[(rot + s) % n]
        out_rows.append(
            ("ring", rid, s, float(p[0]), float(p[1]), float(p[2]),
             None, None, None, None, None, None, None, None)
        )


def _emit_chain(out_rows: list, verts: list, skey: str, ekey: str) -> None:
    """Chain vertex rows (both endpoints INCLUSIVE) + one endpoint-summary
    row carrying the anchors the driver's turn-rule pairing needs."""
    cid = f"C:{skey}>{ekey}:{len(verts)}"
    for s, p in enumerate(verts):
        out_rows.append(
            ("chain", cid, s, float(p[0]), float(p[1]), float(p[2]),
             None, None, None, None, None, None, None, None)
        )
    pen, sec = verts[-2], verts[1]
    out_rows.append(
        ("chain_sum", cid, len(verts), None, None, None, skey, ekey,
         float(pen[0]), float(pen[1]), float(pen[2]),
         float(sec[0]), float(sec[1]), float(sec[2]))
    )


def _stitch_face(key, pdf: pd.DataFrame) -> pd.DataFrame:
    """Stitch ONE face's boundary edges: rings fully interior to the face,
    plus open chains cut at face-border nodes.  Deterministic regardless of
    input row order (edges are processed in sorted-key order)."""
    pdf = pdf.sort_values(["skey", "ekey"], kind="mergesort").reset_index(drop=True)
    pts_a = pdf[["ax", "ay", "az"]].to_numpy()
    pts_b = pdf[["bx", "by", "bz"]].to_numpy()
    skeys = pdf["skey"].tolist()
    ekeys = pdf["ekey"].tolist()
    s_bord = pdf["s_border"].tolist()
    e_bord = pdf["e_border"].tolist()
    # edge record: (a, b, skey, ekey, start_is_border, end_is_border)
    edges: dict[str, list] = {}
    for i in range(len(pdf)):
        edges.setdefault(skeys[i], []).append(
            (pts_a[i], pts_b[i], skeys[i], ekeys[i], bool(s_bord[i]), bool(e_bord[i]))
        )
    used: set[int] = set()
    out_rows: list[tuple] = []
    limit = len(pdf) + 8

    def follow(first, cut_at_border: bool):
        """Walk forward from ``first``; returns (verts, keys, closed).
        With cut_at_border, stop (verts include the border node) when the
        walk reaches a border node; otherwise stop only on closure."""
        used.add(id(first))
        verts, keys = [first[0]], [first[2]]
        prev_pt, cur_pt = first[0], first[1]
        cur_key, cur_border = first[3], first[5]
        start_key = first[2]
        guard = 0
        while True:
            if cut_at_border and cur_border:
                verts.append(cur_pt)
                keys.append(cur_key)
                return verts, keys, cur_key == start_key
            if cur_key == start_key:
                return verts, keys, True
            nxts = [e for e in edges.get(cur_key, []) if id(e) not in used]
            if not nxts:
                verts.append(cur_pt)
                keys.append(cur_key)
                return verts, keys, False
            if len(nxts) == 1:
                nxt = nxts[0]
            else:
                # corner-touch node strictly inside the face: all its edges
                # are local, so the serial most-sharply-left rule applies
                nxt = max(nxts, key=lambda e: _turn_ccw(prev_pt, cur_pt, e[1]))
            used.add(id(nxt))
            verts.append(cur_pt)
            keys.append(cur_key)
            prev_pt, cur_pt = cur_pt, nxt[1]
            cur_key, cur_border = nxt[3], nxt[5]
            guard += 1
            if guard > limit:
                raise ValueError("face stitch: unbounded chain")

    # phase 1 — chains: start from every edge LEAVING a border node
    for skey in sorted(edges):
        for e in edges[skey]:
            if id(e) in used or not e[4]:
                continue
            verts, keys, closed = follow(e, cut_at_border=True)
            if closed:
                _emit_ring(out_rows, verts[:-1], keys[:-1])
            else:
                _emit_chain(out_rows, verts, e[2], keys[-1])
    # phase 2 — whatever remains is interior-closed rings (no border nodes)
    for skey in sorted(edges):
        for e in edges[skey]:
            if id(e) in used:
                continue
            verts, keys, closed = follow(e, cut_at_border=False)
            if not closed:
                raise ValueError("face stitch: open interior chain")
            _emit_ring(out_rows, verts, keys)
    return pd.DataFrame(
        out_rows,
        columns=[
            "kind", "rid", "seq", "x", "y", "z", "skey", "ekey",
            "px", "py", "pz", "sx", "sy", "sz",
        ],
    )


def _link_chains(sums) -> tuple[dict, dict]:
    """Driver half: pair chains at border nodes (the same most-sharply-left
    rule, now with ALL edges at the node visible) and link the cycles.
    Touches only endpoint summaries — O(chains), never O(perimeter).

    Returns ({chain_id: (ring_id, vertex offset)}, {chain_id: n_vertices})."""
    chains: dict[str, dict] = {}
    for r in sums:
        chains[r["rid"]] = {
            "skey": r["skey"], "ekey": r["ekey"], "n": int(r["seq"]),
            "end": _key_floats(r["ekey"]),
            "pen": np.array([r["px"], r["py"], r["pz"]]),
            "sec": np.array([r["sx"], r["sy"], r["sz"]]),
        }
    by_start: dict[str, list] = {}
    for cid in sorted(chains):
        by_start.setdefault(chains[cid]["skey"], []).append(cid)
    nxt: dict[str, str] = {}
    taken: set[str] = set()
    for cid in sorted(chains):
        c = chains[cid]
        cands = [o for o in by_start.get(c["ekey"], []) if o not in taken]
        if not cands:
            raise ValueError("chain linking: no continuation at border node")
        if len(cands) == 1:
            pick = cands[0]
        else:
            pick = max(
                cands,
                key=lambda o: _turn_ccw(c["pen"], c["end"], chains[o]["sec"]),
            )
        nxt[cid] = pick
        taken.add(pick)
    links: dict[str, tuple] = {}
    lens = {cid: c["n"] for cid, c in chains.items()}
    seen: set[str] = set()
    for cid in sorted(chains):
        if cid in seen:
            continue
        cycle = [cid]
        seen.add(cid)
        cur = nxt[cid]
        while cur != cid:
            cycle.append(cur)
            seen.add(cur)
            cur = nxt[cur]
        # rotate the cycle to start at the smallest chain start key
        rot = min(range(len(cycle)), key=lambda i: chains[cycle[i]]["skey"])
        cycle = cycle[rot:] + cycle[:rot]
        # disambiguate like _emit_ring: two cycles can share a start node at
        # a border corner-touch; the first outgoing vertex is unique
        head = chains[cycle[0]]
        rid = "R:" + head["skey"] + ">" + _key_str(head["sec"])
        off = 0
        for c in cycle:
            links[c] = (rid, off)
            off += lens[c] - 1  # each chain's last vertex is the next one's first
    return links, lens


def boundary_rings(spark: SparkSession, tiles_df: DataFrame, level: int) -> DataFrame:
    """Distributed boundary rings of a uniform level-``level`` tile mask.

    ``tiles_df`` needs a ``tile`` column (signed cellid bigints, all at
    ``level``).  Returns (ring_id string, seq long, x, y, z): interior-left
    oriented rings (shells CCW, holes CW), each starting at its smallest
    corner key — ring-for-ring identical to kernel cellunion_boundary."""
    geom = _edge_geometry(_boundary_edges(tiles_df), level)
    stitched = geom.groupBy("face").applyInPandas(
        _stitch_face, schema=_STITCH_SCHEMA
    ).persist()
    try:
        rings = stitched.where(F.col("kind") == "ring").select(
            F.col("rid").alias("ring_id"), "seq", "x", "y", "z"
        )
        sums = stitched.where(F.col("kind") == "chain_sum").collect()
        if sums:
            links, lens = _link_chains(sums)
            lmap = spark.createDataFrame(
                [(cid, rid, off, lens[cid]) for cid, (rid, off) in links.items()],
                "rid string, ring_id string, off long, nverts long",
            )
            chains = (
                stitched.where(F.col("kind") == "chain")
                .join(F.broadcast(lmap), on="rid")
                # drop each chain's final vertex: the next chain in the
                # cycle re-emits that border node as its first vertex
                .where(F.col("seq") < F.col("nverts") - 1)
                .select(
                    "ring_id", (F.col("off") + F.col("seq")).alias("seq"),
                    "x", "y", "z",
                )
            )
            rings = rings.unionByName(chains)
        # break the lineage onto executor storage so the expensive stitch
        # stage is never recomputed, then release the intermediate (the
        # persist must not outlive this call — the bounded-cache lesson)
        rings = rings.localCheckpoint(eager=True)
        return rings
    finally:
        stitched.unpersist()

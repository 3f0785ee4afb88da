"""Distributed raster->vector boundary stitching (the level-12+ scale path).

``cellunion_boundary`` (kernel/vectorize.py) stitches on the driver — sound
while the mask is grid-bounded at coarse levels, but a level-12+ footprint
has a perimeter of millions of edges.  This module keeps every
perimeter-proportional step distributed:

  1. boundary-edge extraction: batched edge-neighbor expansion + one
     LEFT ANTI join against the mask (no geometry yet — pure cellid math);
  2. edge geometry: corners via the kernel's shared batched_cell_corners
     (bit-identical corner keys by construction);
  3. partitioned stitch: groupBy(face, block).applyInPandas — the kernel's
     canonical per-node matching (match_ins_to_outs) applied at every node
     strictly INSIDE the stitch group, yielding (a) rings whose cycle never
     touches a group border and (b) open CHAINS cut at border nodes.
     Border nodes are cut points because the matching needs ALL edges at a
     node, and a border node's edges can live in two groups.  The group is
     the face alone (blocks_level=None, 6 groups) or the face's level-B
     blocks (6*4^B groups — the stitch parallelism ceiling is a knob, not
     a constant; the ring output is invariant to B);
  4. driver linking: only the chain ENDPOINT summaries come to the driver
     (O(chains), not O(perimeter)); the SAME canonical matching pairs
     chains at border nodes and links the cycles;
  5. ring assembly: a broadcast (chain_id -> ring_id, seq offset) map turns
     the distributed chain-vertex rows into final ring rows — ring vertices
     never pass through the driver.

Because both stitchers decide every node with the identical order-free
rule — and both split walks at pinch revisits (face-locally where the
pinch is visible in one chain or interior cycle; at the driver, via
annotated cross-chain pinches and range-based chain maps) — the output is
ring-for-ring identical to cellunion_boundary (orientation included:
interior-left, shells CCW / holes CW), proven on dense pinch-heavy random
masks in tests/test_vectorize_dist.py.  Vertex rotation is deterministic:
interior rings start at their smallest corner key; chain-assembled rings
at a deterministic chain cut (ring ids are stable identifiers, not
geometric keys).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernel import hierarchy as h
from ..kernel.vectorize import (
    batched_cell_corners,
    match_ins_to_outs,
    split_at_repeats,
)

_GEOM_SCHEMA = (
    "face int, blk long, skey string, ekey string, s_border boolean, e_border boolean, "
    "ax double, ay double, az double, bx double, by double, bz double"
)

_STITCH_SCHEMA = (
    "kind string, rid string, seq long, x double, y double, z double, "
    "skey string, ekey string, px double, py double, pz double, "
    "sx double, sy double, sz double"
)


def _key_str(p: np.ndarray) -> str:
    """String form of the kernel's _corner_key rounding (exact: repr of a
    Python float round-trips).  ``float(v)`` before repr: numpy >= 2.0
    (NEP 51) makes repr(np.float64(0.5)) == 'np.float64(0.5)', which
    _key_floats could not parse.  ``+ 0.0`` folds -0.0 into +0.0 — the
    kernel's tuple keys compare them equal, strings would not."""
    return "|".join(repr(float(v)) for v in np.round(p, 14) + 0.0)


def _key_floats(key: str) -> tuple:
    return tuple(float(v) for v in key.split("|"))


def dilate_tiles(tiles_df: DataFrame, level: int) -> DataFrame:
    """tiles ∪ their 4 edge-neighbors (cube FACE_WRAP topology) — one round
    of morphological dilation on the level-``level`` grid, fully
    distributed (batched kernel neighbor expansion, one distinct)."""
    tiles_df = tiles_df.select("tile").distinct()

    def expand(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            t = pdf["tile"].to_numpy(dtype=np.int64)
            nbrs = np.asarray(
                h.edge_neighbors(t.view(np.uint64)), dtype=np.uint64
            ).view(np.int64)
            yield pd.DataFrame({"tile": nbrs.reshape(-1)})

    nbrs = tiles_df.mapInPandas(expand, schema="tile long")
    return tiles_df.unionByName(nbrs).distinct()


def _boundary_edges(tiles_df: DataFrame) -> DataFrame:
    """(tile, k) rows for every cell edge whose neighbor is outside the
    mask.  Distributed: batched neighbor expansion, one LEFT ANTI join.
    The input is deduped first — a duplicated tile would emit its boundary
    edges twice and wreck the downstream perfect matching."""
    tiles_df = tiles_df.select("tile").distinct()

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

    cand = tiles_df.mapInPandas(expand, schema="tile long, k int, nbr long")
    inside = tiles_df.select(F.col("tile").alias("nbr"))
    return cand.join(inside, on="nbr", how="left_anti").select("tile", "k")


def _edge_geometry(
    bd_df: DataFrame, level: int, blocks_level: int | None = None
) -> DataFrame:
    """Boundary (tile, k) -> directed edge geometry + corner keys + border
    flags + stitch-group block id, batched with the kernel's shared corner
    math.

    blocks_level=None groups by face only (border = face border, the
    original 6-way decomposition).  With blocks_level=B, each face is
    subdivided into its 4^B level-B blocks: the stitch group is the edge's
    OWN tile's block, and a corner counts as border when it lies on any
    block grid line — ``ij % 2^(30-B) == 0`` on either axis, which exactly
    subsumes the face border (ij 0 and 2^30 are ≡ 0 mod any power-of-two
    span, and st_to_uv(0)=-1 / st_to_uv(1)=1 are closed-form exact, so the
    uv flag and the ij flag agree at face borders bit-for-bit).  The node
    matching only ever needs all edges AT a node in one group: a corner
    strictly inside a block has all ≤4 incident cells in that block;
    anything on a grid line becomes a chain cut the driver links with the
    same canonical rule — identical machinery, just more (still O(chains))
    driver summaries in exchange for 6·4^B-way stitch parallelism."""

    def geom(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            t = pdf["tile"].to_numpy(dtype=np.int64)
            k = pdf["k"].to_numpy(dtype=np.int64)
            rows = np.arange(len(t))
            if blocks_level is not None:
                # one decode: the corner helper already floored (i_lo, j_lo)
                fi, corners, borders, i_lo, j_lo = batched_cell_corners(
                    t.view(np.uint64), level, return_ij=True
                )
                cs = np.int64(h.size_ij(level))
                shift_b = np.int64(30 - blocks_level)
                span = np.int64(1) << shift_b
                # corner ij coordinates, CCW from the lo corner (kernel order)
                ci = np.stack([i_lo, i_lo + cs, i_lo + cs, i_lo], axis=1)
                cj = np.stack([j_lo, j_lo, j_lo + cs, j_lo + cs], axis=1)
                borders = ((ci % span) == 0) | ((cj % span) == 0)
                blk = ((i_lo >> shift_b) << np.int64(blocks_level)) + (
                    j_lo >> shift_b
                )
            else:
                fi, corners, borders = batched_cell_corners(t.view(np.uint64), level)
                blk = np.zeros(len(t), dtype=np.int64)
            a = corners[rows, k]
            b = corners[rows, (k + 1) & 3]
            yield pd.DataFrame(
                {
                    "face": fi.astype(np.int32),
                    "blk": blk,
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
    smallest corner key and emit vertex rows.  The min key alone can
    collide (two rings touching at a corner node can both have it as their
    min), so the id also carries the unique outgoing vertex."""
    rot = min(range(len(keys)), key=lambda i: keys[i])
    n = len(verts)
    rid = "R:" + _key_str(np.array(verts[rot])) + ">" + _key_str(
        np.array(verts[(rot + 1) % n])
    )
    for s in range(n):
        p = verts[(rot + s) % n]
        out_rows.append(
            ("ring", rid, s, float(p[0]), float(p[1]), float(p[2]),
             None, None, None, None, None, None, None, None)
        )


def _emit_chain(out_rows: list, verts: list, skey: str, ekey: str) -> str:
    """Chain vertex rows (both endpoints INCLUSIVE) + one endpoint-summary
    row carrying the anchors the driver's matching needs.  The id is the
    chain's first directed edge (start node -> second vertex) — globally
    unique: a directed edge belongs to exactly one chain."""
    cid = f"C:{skey}>{_key_str(np.array(verts[1]))}"
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
    return cid


def _stitch_face(key, pdf: pd.DataFrame) -> pd.DataFrame:
    """Stitch ONE face's boundary edges with the kernel's canonical
    per-node matching, applied at every node strictly inside the face.
    Border-node edges stay unmatched here: they become chain endpoints and
    the driver matches them with the same rule.  Deterministic regardless
    of input row order (the matching is order-free; iteration orders are
    sorted)."""
    pdf = pdf.sort_values(["skey", "ekey"], kind="mergesort").reset_index(drop=True)
    pts_a = pdf[["ax", "ay", "az"]].to_numpy()
    pts_b = pdf[["bx", "by", "bz"]].to_numpy()
    skeys = [_key_floats(s) for s in pdf["skey"]]
    ekeys = [_key_floats(s) for s in pdf["ekey"]]
    skey_strs = pdf["skey"].tolist()
    ekey_strs = pdf["ekey"].tolist()
    s_bord = pdf["s_border"].tolist()
    e_bord = pdf["e_border"].tolist()
    n = len(pdf)

    # canonical matching at interior nodes (all their edges are local)
    ins_by_node: dict[tuple, list] = {}
    outs_by_node: dict[tuple, list] = {}
    for ei in range(n):
        if not e_bord[ei]:
            ins_by_node.setdefault(ekeys[ei], []).append((skeys[ei], pts_a[ei], ei))
        if not s_bord[ei]:
            outs_by_node.setdefault(skeys[ei], []).append((pts_b[ei], ei))
    succ = [-1] * n
    for node_key, ins in ins_by_node.items():
        outs = outs_by_node.get(node_key, [])
        if len(outs) != len(ins):
            raise ValueError("face stitch: in/out mismatch at interior node")
        node_pt = np.array(node_key)
        for in_ei, out_ei in match_ins_to_outs(node_pt, ins, outs):
            succ[in_ei] = out_ei

    out_rows: list[tuple] = []
    visited = [False] * n

    # pinch-eligible nodes: interior 4-valent (two boundary passes)
    pinch_nodes = {k for k, ins in ins_by_node.items() if len(ins) == 2}

    # chains: start from every edge leaving a border node, follow the
    # matching until an edge ENDING at a border node.  A walk revisiting an
    # interior PINCH node carries a pocket ring — split it out locally
    # (split_at_repeats); the reduced remainder is the chain.  A pinch whose
    # two passes land in DIFFERENT chains cannot be split here: it is
    # annotated ('pinch' rows) and the driver splits the assembled ring.
    chain_hits: dict[tuple, list] = {}
    for ei in sorted(range(n), key=lambda i: (skey_strs[i], ekey_strs[i])):
        if visited[ei] or not s_bord[ei]:
            continue
        verts, keys = [], []
        cur, guard = ei, 0
        while True:
            visited[cur] = True
            verts.append(pts_a[cur])
            keys.append(skeys[cur])
            if e_bord[cur]:
                parts = split_at_repeats(verts, keys)
                for ring_v, ring_k in parts[:-1]:
                    _emit_ring(out_rows, ring_v, ring_k)
                chain_v = parts[-1][0] + [pts_b[cur]]
                cid = _emit_chain(
                    out_rows, chain_v,
                    _key_str(np.array(chain_v[0])), ekey_strs[cur],
                )
                for pos, kk in enumerate(parts[-1][1]):
                    if kk in pinch_nodes:
                        chain_hits.setdefault(kk, []).append((cid, pos))
                break
            cur = succ[cur]
            guard += 1
            if guard > n:
                raise ValueError("face stitch: unbounded chain")
    for kk, hits in sorted(chain_hits.items()):
        if len(hits) == 2 and hits[0][0] != hits[1][0]:
            (ca, pa), (cb, pb) = sorted(hits)
            out_rows.append(
                ("pinch", ca, pa, None, None, None, None, cb,
                 float(pb), None, None, None, None, None)
            )
    # whatever remains is interior-closed walks (cycles of the matching);
    # pinch revisits split into node-disjoint rings
    for ei in sorted(range(n), key=lambda i: (skey_strs[i], ekey_strs[i])):
        if visited[ei]:
            continue
        verts, keys = [], []
        cur, guard = ei, 0
        while True:
            visited[cur] = True
            verts.append(pts_a[cur])
            keys.append(skeys[cur])
            cur = succ[cur]
            if cur < 0:
                raise ValueError("face stitch: unmatched edge in interior cycle")
            guard += 1
            if cur == ei:
                break
            if guard > n:
                raise ValueError("face stitch: unbounded interior cycle")
        for ring_v, ring_k in split_at_repeats(verts, keys):
            _emit_ring(out_rows, ring_v, ring_k)
    return pd.DataFrame(
        out_rows,
        columns=[
            "kind", "rid", "seq", "x", "y", "z", "skey", "ekey",
            "px", "py", "pz", "sx", "sy", "sz",
        ],
    )


def _assemble_base_rings(sums) -> list:
    """Driver half: pair chains at border nodes with the SAME canonical
    matching the kernel applies (ins sorted by their incoming edge's start
    key, each taking the most-sharply-left remaining out), link the cycles,
    and split walks that revisit a border pinch node.  Touches only
    endpoint summaries — O(chains), never O(perimeter).

    Returns rings as segment lists [(chain_id, lo, hi), ...] where each
    chain contributes vertices [lo, hi) (its final border vertex excluded —
    the next chain re-emits it)."""
    chains: dict[str, dict] = {}
    for r in sums:
        chains[r["rid"]] = {
            "skey": r["skey"], "ekey": r["ekey"], "n": int(r["seq"]),
            "pen": np.array([r["px"], r["py"], r["pz"]]),
            "sec": np.array([r["sx"], r["sy"], r["sz"]]),
        }
    # group chain endpoints per border node, then run the kernel matching
    ins_by_node: dict[tuple, list] = {}
    outs_by_node: dict[tuple, list] = {}
    for cid in sorted(chains):
        c = chains[cid]
        # the in-edge's start vertex is the chain's penultimate point
        ins_by_node.setdefault(_key_floats(c["ekey"]), []).append(
            (tuple(np.round(c["pen"], 14)), c["pen"], cid)
        )
        outs_by_node.setdefault(_key_floats(c["skey"]), []).append((c["sec"], cid))
    nxt: dict[str, str] = {}
    for node_key, ins in ins_by_node.items():
        outs = outs_by_node.get(node_key, [])
        if len(outs) != len(ins):
            raise ValueError("chain linking: in/out mismatch at border node")
        node_pt = np.array(node_key)
        for in_cid, out_cid in match_ins_to_outs(node_pt, ins, outs):
            nxt[in_cid] = out_cid
    lens = {cid: c["n"] for cid, c in chains.items()}
    seen: set[str] = set()
    rings: list[list] = []  # ring = list of (chain_id, lo, hi) segments
    for cid in sorted(chains):
        if cid in seen:
            continue
        walk = [cid]
        seen.add(cid)
        cur = nxt[cid]
        while cur != cid:
            walk.append(cur)
            seen.add(cur)
            cur = nxt[cur]
        # a walk revisiting a border PINCH node is split into node-disjoint
        # rings, exactly like the kernel's cycle extraction
        for cycle, _keys in split_at_repeats(
            walk, [_key_floats(chains[c]["skey"]) for c in walk]
        ):
            rings.append([(c, 0, lens[c] - 1) for c in cycle])
    return rings


def _ring_split(ring: list, ga: int, gb: int) -> tuple[list, list]:
    """Split a segment-list ring at global vertex positions ga < gb into
    [ga, gb) and [gb, ga+L) — segments sliced at the cut points."""

    def slice_range(start: int, length: int) -> list:
        out, need = [], length
        # walk the cyclic segment list twice to cover wrap-around
        segs = ring + ring
        skipped = start
        for c, lo, hi in segs:
            ln = hi - lo
            if skipped >= ln:
                skipped -= ln
                continue
            take = min(ln - skipped, need)
            out.append((c, lo + skipped, lo + skipped + take))
            need -= take
            skipped = 0
            if need == 0:
                break
        return out

    total = sum(hi - lo for _, lo, hi in ring)
    return slice_range(ga, gb - ga), slice_range(gb, total + ga - gb)


def _apply_pinches(rings: list, pinches: list) -> list:
    """Split assembled rings at interior pinch nodes whose two passes landed
    in different chains (annotated by the face tasks).  Only applies when
    both passes are in the SAME ring — two distinct rings legitimately
    sharing the node need no action.  Pinches of a non-crossing boundary
    are properly nested, so order does not affect the final set; processing
    is sorted for determinism."""

    def locate(chain: str, pos: int):
        for ri, ring in enumerate(rings):
            g = 0
            for c, lo, hi in ring:
                if c == chain and lo <= pos < hi:
                    return ri, g + (pos - lo)
                g += hi - lo
        return None, None

    for ca, pa, cb, pb in sorted(pinches):
        ra, ga = locate(ca, pa)
        rb, gb = locate(cb, pb)
        if ra is None or rb is None or ra != rb:
            continue
        lo_g, hi_g = (ga, gb) if ga < gb else (gb, ga)
        r1, r2 = _ring_split(rings[ra], lo_g, hi_g)
        rings[ra] = r1
        rings.append(r2)
    return rings


def boundary_rings(
    spark: SparkSession,
    tiles_df: DataFrame,
    level: int,
    blocks_level: int | None = None,
) -> DataFrame:
    """Distributed boundary rings of a uniform level-``level`` tile mask.

    ``tiles_df`` needs a ``tile`` column (signed cellid bigints, all at
    ``level``; duplicates are dropped).  Returns (ring_id string, seq long,
    x, y, z): interior-left oriented rings (shells CCW, holes CW),
    ring-for-ring identical to kernel cellunion_boundary (pinched masks
    included).  Vertex rotation is deterministic: interior rings start at
    their smallest corner key; chain-assembled rings at a deterministic
    chain cut (ring ids are unique, stable identifiers, not geometric
    keys).

    ``blocks_level`` (None = per-face stitch, 6 groups) subdivides each
    face into 4^B level-B blocks and stitches per (face, block), lifting
    the stitch parallelism ceiling from 6 to 6·4^B tasks; the ring output
    is invariant to the choice (chains cut at block grid lines are linked
    by the same canonical matching, tests prove identity across B)."""
    if blocks_level is not None and not (1 <= blocks_level <= level):
        # block grid must be no finer than the cell grid: a block line
        # through a cell's interior would put one edge in two groups
        raise ValueError(f"blocks_level must be in [1, {level}], got {blocks_level}")
    geom = _edge_geometry(_boundary_edges(tiles_df), level, blocks_level)
    stitched = geom.groupBy("face", "blk").applyInPandas(
        _stitch_face, schema=_STITCH_SCHEMA
    ).persist()
    try:
        rings = stitched.where(F.col("kind") == "ring").select(
            F.col("rid").alias("ring_id"), "seq", "x", "y", "z"
        )
        meta = stitched.where(F.col("kind").isin("chain_sum", "pinch")).collect()
        sums = [r for r in meta if r["kind"] == "chain_sum"]
        if sums:
            pinches = [
                (r["rid"], int(r["seq"]), r["ekey"], int(r["px"]))
                for r in meta
                if r["kind"] == "pinch"
            ]
            seg_rings = _apply_pinches(_assemble_base_rings(sums), pinches)
            lmap_rows = []
            for ring in seg_rings:
                # canonical rotation: start at the smallest (chain, lo) cut
                rot = min(range(len(ring)), key=lambda i: (ring[i][0], ring[i][1]))
                ring = ring[rot:] + ring[:rot]
                ring_id = f"R:{ring[0][0]}@{ring[0][1]}"
                off = 0
                for c, lo, hi in ring:
                    lmap_rows.append((c, ring_id, off, lo, hi))
                    off += hi - lo
            lmap = spark.createDataFrame(
                lmap_rows, "rid string, ring_id string, off long, lo long, hi long"
            )
            chains = (
                stitched.where(F.col("kind") == "chain")
                .join(F.broadcast(lmap), on="rid")
                # each vertex row belongs to exactly one (lo, hi) slice; a
                # chain's final vertex is excluded everywhere (hi <= n-1):
                # the next chain in the cycle re-emits that border node
                .where((F.col("seq") >= F.col("lo")) & (F.col("seq") < F.col("hi")))
                .select(
                    "ring_id",
                    (F.col("off") + F.col("seq") - F.col("lo")).alias("seq"),
                    "x", "y", "z",
                )
            )
            rings = rings.unionByName(chains)
        # break the lineage onto executor storage so the expensive stitch
        # stage is never recomputed, then release the intermediate (the
        # persist must not outlive this call — the bounded-cache lesson)
        rings = rings.localCheckpoint(eager=True)
        if not rings.take(1) and tiles_df.select("tile").take(1):
            # a non-empty uniform mask with NO boundary covers the whole
            # sphere; a rings DataFrame cannot represent the FULL polygon
            # (kernel cellunion_boundary returns Loop.full() here) — fail
            # loudly instead of aliasing full with empty.  The guard's
            # take(1) on the checkpointed rings is ~free; the second
            # take(1) runs only on the already-empty path.
            raise ValueError(
                "boundary_rings: mask covers the full sphere (no boundary); "
                "the FULL polygon has no ring representation — handle this "
                "case before calling (kernel path returns Loop.full())"
            )
        return rings
    finally:
        stitched.unpersist()

"""s2_cell_compact vs the kernel CellUnion.normalize (the reference-vector-
backed serial algorithm), and dedup_cluster structural invariants vs the
(separately oracled) MinHash pair table.

The compaction cross-check is the strong one: the distributed closed-form
("complete cells whose parent is not complete") and the kernel's sequential
sort-and-collapse (cellunion.rs:61-127) are entirely different algorithms
that must emit the IDENTICAL cell set.
"""

from __future__ import annotations

import numpy as np

from rust_s2_spark.engine import specs
from rust_s2_spark.kernel import hierarchy as h
from rust_s2_spark.kernel import hilbert
from rust_s2_spark.kernel.covering import CellUnion


def _compact_cellids(rows, lvl):
    """(level, face, ti, tj) -> cellid at that level via the kernel encode."""
    out = []
    for r in rows:
        shift = 30 - lvl
        # corner leaf of the tile at its own level: scale grid coords back
        # to leaf ij
        i = r.ti << (30 - r.level)
        j = r.tj << (30 - r.level)
        leaf = hilbert.cellid_from_face_ij(
            np.int64(r.face), np.int64(i), np.int64(j)
        )
        out.append(int(h.parent(np.uint64(leaf), r.level)))
        del shift
    return sorted(out)


def test_cell_compact_matches_kernel_normalize(spark):
    from rust_s2_spark.engine.queries import QUERIES, _grid_counts, clear_geo_cache

    sf = "/root/testdata/sf0.01"
    lvl = specs.COMPACT_LEVEL
    occupied = [
        int(r.tile) & ((1 << 64) - 1)
        for r in _grid_counts(spark, sf, lvl).select("tile").collect()
    ]
    cu = CellUnion(occupied)
    cu.normalize()
    want = sorted(int(np.uint64(c)) for c in cu.ids)

    rows = QUERIES["s2_cell_compact"](spark, sf).collect()
    got = _compact_cellids(rows, lvl)
    assert got == want
    # real compaction must have happened at gate density (some cells above
    # the leaf level), and n_tiles is exactly 4^(L-level)
    assert any(r.level < lvl for r in rows)
    for r in rows:
        assert r.n_tiles == 1 << (2 * (lvl - r.level))
    # coverage: kept cells partition the occupied set exactly
    assert sum(r.n_tiles for r in rows) == len(occupied)
    # event conservation
    n_events = sum(r.n_events for r in rows)
    import duckdb

    assert n_events == duckdb.sql(
        f"SELECT count(*) FROM '{sf}/events.parquet'"
    ).fetchone()[0]
    clear_geo_cache()


def test_dedup_cluster_invariants(spark):
    from rust_s2_spark.engine.queries import QUERIES, clear_geo_cache

    sf = "/root/testdata/sf0.01"
    pairs = (
        QUERIES["minhash_lsh"](spark, sf)
        .where(f"est_sim >= {specs.DEDUP_SIM_THRESHOLD}")
        .collect()
    )
    assert len(pairs) > 5, "fixture must contain near-dup pairs"
    lab = QUERIES["dedup_cluster"](spark, sf).collect()
    canon = {r.doc_id: r.canonical_id for r in lab}
    size = {r.doc_id: r.cluster_size for r in lab}
    n_docs = len(lab)
    # every doc labeled exactly once; canonical is a member and is minimal
    assert len(canon) == n_docs
    for r in lab:
        assert r.canonical_id <= r.doc_id
        assert canon[r.canonical_id] == r.canonical_id, "canonical is canonical"
        assert r.is_canonical == (r.doc_id == r.canonical_id)
        assert size[r.doc_id] == size[r.canonical_id]
    # dup edges never cross clusters
    for p in pairs:
        assert canon[p.doc_a] == canon[p.doc_b], (p.doc_a, p.doc_b)
    # cluster sizes are the actual member counts and sum to the corpus
    from collections import Counter

    member_counts = Counter(canon.values())
    for r in lab:
        assert r.cluster_size == member_counts[r.canonical_id]
    assert sum(member_counts.values()) == n_docs
    # the keep-filter semantics: exactly one canonical per cluster
    keep = [r for r in lab if r.is_canonical]
    assert len(keep) == len(member_counts)
    clear_geo_cache()


def test_tile_pyramid_invariants(spark):
    """Structural invariants of the multi-resolution rollup (the
    cross-engine value gate lives in the oracle suite): per-level event
    conservation, sibling shares, and parent linkage."""
    from collections import defaultdict

    import duckdb

    from rust_s2_spark.engine.queries import QUERIES, clear_geo_cache

    sf = "/root/testdata/sf0.01"
    rows = QUERIES["s2_tile_pyramid"](spark, sf).collect()
    total = duckdb.sql(f"SELECT count(*) FROM '{sf}/events.parquet'").fetchone()[0]
    by_level = defaultdict(list)
    for r in rows:
        by_level[r.level].append(r)
    assert sorted(by_level) == list(specs.PYRAMID_LEVELS)
    idx = {(r.level, r.face, r.ti, r.tj): r for r in rows}
    for lvl, rs in by_level.items():
        # every level partitions the corpus
        assert sum(r.n_events for r in rs) == total
        for r in rs:
            assert r.n_events > 0 and r.n_tiles > 0
            if lvl == specs.PYRAMID_LEVELS[0]:
                assert r.frac_of_parent is None
            else:
                p = idx[(lvl - 2, r.face, r.ti >> 2, r.tj >> 2)]
                assert r.frac_of_parent == r.n_events / p.n_events
                assert 0.0 < r.frac_of_parent <= 1.0
    # children exactly exhaust each parent's events
    for lvl in specs.PYRAMID_LEVELS[1:]:
        child_sum = defaultdict(int)
        for r in by_level[lvl]:
            child_sum[(r.face, r.ti >> 2, r.tj >> 2)] += r.n_events
        for p in by_level[lvl - 2]:
            assert child_sum[(p.face, p.ti, p.tj)] == p.n_events
    clear_geo_cache()

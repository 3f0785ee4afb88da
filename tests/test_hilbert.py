"""CellID kernel oracles ported from the reference test suite.

Vectors: /root/reference/src/s2/cellid.rs:1118-1134 (latlng), 1242-1286 (tokens),
1041-1095 (parent/child + containment), 1136-1195 (neighbors).
"""

from __future__ import annotations

import numpy as np
import pytest

from rust_s2_spark.kernel import hierarchy as h
from rust_s2_spark.kernel import hilbert, stuv
from rust_s2_spark.kernel.constants import MAX_LEVEL, MAX_SIZE

# cellid.rs:1118-1134 — exact u64 <-> latlng vectors.
LATLNG_VECTORS = [
    (0x47A1CBD595522B39, 49.703498679, 11.770681595),
    (0x46525318B63BE0F9, 55.685376759, 12.588490937),
    (0x52B30B71698E729D, 45.486546517, -93.449700022),
    (0x46ED8886CFADDA85, 58.299984854, 23.049300056),
    (0x3663F18A24CBE857, 34.364439040, 108.330699969),
    (0x10A06C0A948CF5D, -30.694551352, -30.048758753),
    (0x2B2BFD076787C5DF, -25.285264027, 133.823116966),
    (0xB09DFF882A7809E1, -75.000000031, 0.000000133),
    (0x94DAA3D000000001, -24.694439215, -47.537363213),
    (0x87A1000000000001, 38.899730392, -99.901813021),
    (0x4FC76D5000000001, 81.647200334, -55.631712940),
    (0x3B00955555555555, 10.050986518, 78.293170610),
    (0x1DCC469991555555, -34.055420593, 18.551140038),
    (0xB112966AAAAAAAAB, -69.219262171, 49.670072392),
]


def test_latlng_to_cellid_exact():
    lats = np.array([v[1] for v in LATLNG_VECTORS])
    lngs = np.array([v[2] for v in LATLNG_VECTORS])
    want = np.array([v[0] for v in LATLNG_VECTORS], dtype=np.uint64)
    got = hilbert.cellid_from_latlng(lats, lngs)
    assert np.array_equal(got, want)


def test_cellid_to_latlng_roundtrip():
    cids = np.array([v[0] for v in LATLNG_VECTORS], dtype=np.uint64)
    lat, lng = hilbert.cellid_to_latlng(cids)
    want_lat = np.array([v[1] for v in LATLNG_VECTORS])
    want_lng = np.array([v[2] for v in LATLNG_VECTORS])
    # cellid.rs:1112-1113: angular distance < 1e-9 degrees.
    # Chord length ~= angle for tiny angles (arccos loses precision near 1).
    x1, y1, z1 = stuv.latlng_to_xyz(lat, lng)
    x2, y2, z2 = stuv.latlng_to_xyz(want_lat, want_lng)
    chord = np.sqrt((x1 - x2) ** 2 + (y1 - y2) ** 2 + (z1 - z2) ** 2)
    assert np.all(np.degrees(chord) < 1.0e-9)
    # And re-encoding the center returns the identical id.
    assert np.array_equal(hilbert.cellid_from_latlng(lat, lng), cids)


# cellid.rs:1242-1275
TOKEN_VECTORS = [
    ("1", 0x1000000000000000),
    ("3", 0x3000000000000000),
    ("14", 0x1400000000000000),
    ("41", 0x4100000000000000),
    ("094", 0x0940000000000000),
    ("537", 0x5370000000000000),
    ("3fec", 0x3FEC000000000000),
    ("72f3", 0x72F3000000000000),
    ("52b8c", 0x52B8C00000000000),
    ("990ed", 0x990ED00000000000),
    ("4476dc", 0x4476DC0000000000),
    ("2a724f", 0x2A724F0000000000),
    ("7d4afc4", 0x7D4AFC4000000000),
    ("b675785", 0xB675785000000000),
    ("40cd6124", 0x40CD612400000000),
    ("3ba32f81", 0x3BA32F8100000000),
    ("08f569b5c", 0x08F569B5C0000000),
    ("385327157", 0x3853271570000000),
    ("166c4d1954", 0x166C4D1954000000),
    ("96f48d8c39", 0x96F48D8C39000000),
    ("0bca3c7f74c", 0x0BCA3C7F74C00000),
    ("1ae3619d12f", 0x1AE3619D12F00000),
    ("07a77802a3fc", 0x07A77802A3FC0000),
    ("4e7887ec1801", 0x4E7887EC18010000),
    ("4adad7ae74124", 0x4ADAD7AE74124000),
    ("90aba04afe0c5", 0x90ABA04AFE0C5000),
    ("8ffc3f02af305c", 0x8FFC3F02AF305C00),
    ("6fa47550938183", 0x6FA4755093818300),
    ("aa80a565df5e7fc", 0xAA80A565DF5E7FC0),
    ("01614b5e968e121", 0x01614B5E968E1210),
    ("aa05238e7bd3ee7c", 0xAA05238E7BD3EE7C),
    ("48a23db9c2963e5b", 0x48A23DB9C2963E5B),
]


@pytest.mark.parametrize("token,cid", TOKEN_VECTORS)
def test_tokens_nominal(token, cid):
    assert h.to_token(np.uint64(cid)) == token
    assert h.from_token(token) == np.uint64(cid)


def test_tokens_errors():
    # cellid.rs:1277-1286
    assert h.to_token(np.uint64(0)) == "X"
    assert h.from_token("X") == 0
    for bad in ["876b e99", "876bee99\n", "876[ee99", " 876bee99"]:
        assert h.from_token(bad) == 0


def test_containment_truth_table():
    # cellid.rs:1076-1095 — Pittsburg cells
    a = np.uint64(0x80855C0000000000)
    b = np.uint64(0x80855D0000000000)
    c = np.uint64(0x80855DC000000000)
    d = np.uint64(0x8085630000000000)
    cases = [
        (a, a, True, True, True),
        (a, b, True, False, True),
        (a, c, True, False, True),
        (a, d, False, False, False),
        (b, b, True, True, True),
        (b, c, True, False, True),
        (b, d, False, False, False),
        (c, c, True, True, True),
        (c, d, False, False, False),
        (d, d, True, True, True),
    ]
    for x, y, xcy, ycx, xiy in cases:
        assert bool(h.contains(x, y)) == xcy
        assert bool(h.contains(y, x)) == ycx
        assert bool(h.intersects(x, y)) == xiy
        assert bool(h.intersects(y, x)) == xiy


def test_parent_child_relationships():
    # cellid.rs:1041-1061
    def pos(cid):
        return int(cid) & ((1 << 61) - 1)

    ci = h.from_face_pos_level(3, np.uint64(0x12345678), MAX_LEVEL - 4)
    assert bool(h.is_valid(ci))
    assert int(ci >> np.uint64(61)) == 3
    assert pos(ci) == 0x12345700
    assert int(h.level(ci)) == 26
    assert not bool(h.is_leaf(ci))

    assert pos(h.child_begin_at_level(ci, int(h.level(ci)) + 2)) == 0x12345610
    kids = h.children(ci)
    assert pos(kids[0]) == 0x12345640
    assert pos(h.immediate_parent(ci)) == 0x12345400
    assert pos(h.parent(ci, int(h.level(ci)) - 2)) == 0x12345000

    # child ordering and range identities (cellid.rs:1053-1060)
    assert int(kids[0]) < int(ci)
    assert int(h.range_min(ci)) == int(h.child_begin_at_level(ci, MAX_LEVEL))
    assert int(h.next_cell(h.range_max(ci))) == int(h.child_end_at_level(ci, MAX_LEVEL))


def test_edge_neighbors_face1_corner():
    # cellid.rs:1136-1151
    corner = h.parent(hilbert.cellid_from_face_ij(1, 0, 0), 0)
    nbrs = h.edge_neighbors(corner)
    faces = [int(n) >> 61 for n in nbrs]
    assert faces == [5, 3, 2, 0]
    assert all(bool(h.is_face(n)) for n in nbrs)

    max_ij = MAX_SIZE - 1
    for lvl in range(1, MAX_LEVEL + 1):
        cid = h.parent(hilbert.cellid_from_face_ij(1, 0, 0), lvl)
        lvl_size = int(h.size_ij(lvl))
        want = [
            int(h.parent(hilbert.cellid_from_face_ij(5, max_ij, max_ij), lvl)),
            int(h.parent(hilbert.cellid_from_face_ij(1, lvl_size, 0), lvl)),
            int(h.parent(hilbert.cellid_from_face_ij(1, 0, lvl_size), lvl)),
            int(h.parent(hilbert.cellid_from_face_ij(0, max_ij, 0), lvl)),
        ]
        got = [int(n) for n in h.edge_neighbors(cid)]
        assert got == want, f"level {lvl}"


def test_vertex_neighbors():
    # cellid.rs:1153-1183
    cid = hilbert.cellid_from_xyz(np.array([0.0]), np.array([0.0]), np.array([1.0]))[0]
    nbrs = sorted(set(int(v) for v in h.vertex_neighbors(cid, 5)))
    for n, nbr in enumerate(nbrs):
        i, j = 1 << 29, 1 << 29
        if n < 2:
            i -= 1
        if n == 0 or n == 3:
            j -= 1
        assert nbr == int(h.parent(hilbert.cellid_from_face_ij(2, i, j), 5))

    cid2 = h.from_face_pos_level(0, np.uint64(0), MAX_LEVEL)
    nbrs2 = sorted(set(int(v) for v in h.vertex_neighbors(cid2, 0)))
    assert len(nbrs2) == 3
    assert nbrs2[0] == int(h.from_face(0))
    assert nbrs2[1] == int(h.from_face(4))


def test_hilbert_continuity():
    # cellid.rs:1704-1734 — successive cells at a level are close together.
    from rust_s2_spark.kernel.constants import MAX_WIDTH

    lvl = 8
    max_walk = top = 256
    cid = h.child_begin_at_level(h.from_face(0), lvl)
    end = h.child_end_at_level(h.from_face(5), lvl)
    max_dist = MAX_WIDTH.value(lvl)
    for _ in range(max_walk):
        nxt = h.next_cell(cid)
        if int(nxt) == int(end):
            break
        x1, y1, z1 = hilbert.cellid_to_xyz(cid)
        x2, y2, z2 = hilbert.cellid_to_xyz(nxt)
        dot = np.clip(x1 * x2 + y1 * y2 + z1 * z2, -1, 1)
        assert float(np.arccos(dot)) <= max_dist
        cid = nxt
    assert top == max_walk


def test_face_ij_roundtrip_random():
    rng = np.random.default_rng(42)
    f = rng.integers(0, 6, 10000)
    i = rng.integers(0, MAX_SIZE, 10000)
    j = rng.integers(0, MAX_SIZE, 10000)
    cid = hilbert.cellid_from_face_ij(f, i, j)
    f2, i2, j2, _ = hilbert.cellid_to_face_ij_orientation(cid)
    assert np.array_equal(f, f2)
    assert np.array_equal(i, i2)
    assert np.array_equal(j, j2)
    assert np.all(h.is_leaf(cid))
    assert np.all(h.is_valid(cid))


def test_advance_and_common_ancestor():
    # cellid.rs:1399-1452, 1613-1683 spot checks
    face0 = h.from_face(0)
    begin = h.child_begin_at_level(face0, MAX_LEVEL)
    assert int(h.advance(begin, 0)) == int(begin)
    a = h.advance(begin, 7)
    assert int(h.advance(a, -7)) == int(begin)
    # common ancestor of two children of the same parent is the parent level
    kids = h.children(h.parent(np.uint64(LATLNG_VECTORS[0][0]), 10))
    lvl = h.common_ancestor_level(kids[0], kids[1])
    assert int(lvl) == 10
    # different faces -> none
    assert int(h.common_ancestor_level(h.from_face(0), h.from_face(3))) == -1
    # a cell and its parent -> parent's level
    c = np.uint64(LATLNG_VECTORS[0][0])
    assert int(h.common_ancestor_level(c, h.parent(c, 5))) == 5

"""S2 cell ids (parity + invariants) and the S2-indexed PIP join."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from opentopodata_spark import s2
from opentopodata_spark.operators import spatial


def test_s2_known_ids():
    """Parity with canonical S2: leaf id of (0,0) is the published
    0x1000000000000001; NYC / Sydney ids carry the well-known region
    token prefixes (89c2..., 6b12...)."""
    ids = s2.leaf_ids(
        np.array([0.0, 40.689247, -33.865143]),
        np.array([0.0, -74.044502, 151.209900]),
    )
    assert int(ids[0]) == 0x1000000000000001
    assert f"{int(ids[1]):016x}".startswith("89c2")
    assert f"{int(ids[2]):016x}".startswith("6b12")


def test_s2_hierarchy_invariants():
    rng = np.random.default_rng(11)
    lats = rng.uniform(-89, 89, 2000)
    lons = rng.uniform(-180, 180, 2000)
    leaf = s2.leaf_ids(lats, lons)
    assert (s2.level_of(leaf) == 30).all()
    for lvl in (0, 3, 12, 29):
        p = s2.parent(leaf, lvl)
        assert (s2.level_of(p) == lvl).all()
        # grandparent via child == grandparent via leaf
        if lvl > 0:
            assert (s2.parent(p, lvl - 1) == s2.parent(leaf, lvl - 1)).all()
    assert set(s2.face_of(leaf).tolist()) == {0, 1, 2, 3, 4, 5}


def test_s2_pos_ij_roundtrip():
    rng = np.random.default_rng(12)
    leaf = s2.leaf_ids(rng.uniform(-89, 89, 500), rng.uniform(-180, 180, 500))
    face = (leaf >> np.uint64(61)).astype(np.uint64)
    pos = (leaf >> np.uint64(1)) & np.uint64((1 << 60) - 1)
    i, j = s2._ij_from_pos(face, pos)
    assert (s2._pos_from_ij(face, i, j) == pos).all()


def test_s2_locality():
    """Points inside one small neighborhood share coarse parents."""
    lats = 47.0 + np.linspace(0, 0.001, 50)
    lons = 8.0 + np.linspace(0, 0.001, 50)
    cells = s2.cell_ids(lats, lons, 10)
    assert len(np.unique(cells)) == 1


def test_ray_cast_concave():
    # L-shaped concave polygon
    pla = [0.0, 4.0, 4.0, 2.0, 2.0, 0.0]
    plo = [0.0, 0.0, 2.0, 2.0, 4.0, 4.0]
    lats = np.array([1.0, 3.0, 3.0, 1.0, 5.0, -1.0])
    lons = np.array([1.0, 1.0, 3.0, 3.0, 1.0, 1.0])
    got = spatial.points_in_polygon_mask(lats, lons, pla, plo)
    # (3,3) is in the notch (outside); (1,3) inside the foot
    assert got.tolist() == [True, True, False, True, False, False]


def test_cover_cells_superset():
    pla = [10.0, 12.0, 12.0, 10.0]
    plo = [20.0, 20.0, 22.0, 22.0]
    cover = set(spatial.polygon_cover_cells(pla, plo, 8).tolist())
    rng = np.random.default_rng(13)
    lats = rng.uniform(10, 12, 500)
    lons = rng.uniform(20, 22, 500)
    inside_cells = s2.cell_ids(lats, lons, 8)
    assert set(inside_cells.tolist()) <= cover


def test_region_cover_superset_hard_regions():
    """The recursive coverer never drops a cell containing a region point —
    including pole caps, antimeridian-adjacent strips, and face corners."""
    rng = np.random.default_rng(21)
    for (lat0, lat1, lon0, lon1, lvl) in [
        (85.0, 90.0, -180.0, 180.0, 7),    # north pole cap
        (-90.0, -80.0, -10.0, 10.0, 7),    # south pole wedge
        (10.0, 20.0, 170.0, 179.9, 8),     # near the antimeridian
        (40.0, 50.0, 40.0, 50.0, 9),       # face-corner region (45,45)
        (0.0, 0.02, 0.0, 0.02, 14),        # tiny region, fine level
    ]:
        cover = set(s2.region_cover_cells(lat0, lat1, lon0, lon1, lvl).tolist())
        lats = rng.uniform(lat0, lat1, 10000)
        lons = rng.uniform(lon0, lon1, 10000)
        missing = set(np.unique(s2.cell_ids(lats, lons, lvl)).tolist()) - cover
        assert not missing, (lat0, lat1, lon0, lon1, lvl, len(missing))


def test_continent_cover_level12_no_blowup():
    """Continent-sized polygon at level 12: the old dense-grid cover built
    an O((extent/cell)^2) point meshgrid (tens of GB); the recursive
    coverer is O(|cover|) and runs in seconds."""
    import time

    pla = [35.0, 70.0, 70.0, 35.0]
    plo = [-10.0, -10.0, 40.0, 40.0]
    t0 = time.time()
    cover = spatial.polygon_cover_cells(pla, plo, 12)
    assert time.time() - t0 < 30.0
    assert 1_000_000 < len(cover) < 8_000_000
    assert cover.nbytes < 100 * 2**20
    # spot-check the superset property on the big cover
    rng = np.random.default_rng(3)
    lats = rng.uniform(35, 70, 5000)
    lons = rng.uniform(-10, 40, 5000)
    cs = set(cover.tolist())
    assert all(int(c) in cs for c in s2.cell_ids(lats, lons, 12))


def test_pip_join_spark(spark):
    pla = [0.0, 4.0, 4.0, 2.0, 2.0, 0.0]
    plo = [0.0, 0.0, 2.0, 2.0, 4.0, 4.0]
    pts = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 3.0, 1.0), (3, 3.0, 3.0), (4, 1.0, 3.0), (5, 50.0, 50.0)],
        "point_id long, lat double, lon double",
    )
    out = spatial.point_in_polygon_join(
        pts, [{"polygon_id": "L", "lats": pla, "lons": plo}], level=8
    )
    got = sorted(r.point_id for r in out.collect())
    assert got == [1, 2, 4]


def test_s2_cell_udf_matches_local(spark):
    rng = np.random.default_rng(14)
    lats = rng.uniform(-80, 80, 300)
    lons = rng.uniform(-179, 179, 300)
    df = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(lats, lons))],
        "id long, lat double, lon double",
    )
    got = {
        r.id: np.uint64(np.int64(r.c))
        for r in spatial.with_s2_cell(df, 12, out_col="c").collect()
    }
    want = s2.cell_ids(lats, lons, 12)
    assert all(got[i] == want[i] for i in range(300))


# -- polygon-aware cover (VERDICT r02 #9): drop cells disjoint from a
# -- concave polygon, pre-answer proven-interior cells


_CONCAVE_PLA = [35.0, 70.0, 70.0, 60.0, 60.0, 35.0]
_CONCAVE_PLO = [-10.0, -10.0, 40.0, 40.0, 0.0, 0.0]  # big L: ~57% of bbox


def test_polygon_cover_concave_fanout_drop():
    """The polygon-aware cover must beat the bbox cover on a
    continent-sized concave polygon: the notch's cells are dropped and
    most kept cells are proven interior (no refinement needed)."""
    bbox = s2.region_cover_cells(35.0, 70.0, -10.0, 40.0, 10)
    ids, interior = s2.polygon_cover_cells(_CONCAVE_PLA, _CONCAVE_PLO, 10)
    assert set(ids.tolist()) <= set(bbox.tolist())
    assert len(ids) < 0.65 * len(bbox)  # the notch is ~57% of the bbox
    assert interior.mean() > 0.5  # interior dominates at fine levels


def test_polygon_cover_superset_and_interior_sound():
    """Superset: every cell containing an inside point is covered.
    Soundness: a cell flagged interior NEVER contains an outside point
    (its points legitimately skip the exact ray cast)."""
    rng = np.random.default_rng(29)
    lats = rng.uniform(34.0, 71.0, 20000)
    lons = rng.uniform(-11.0, 41.0, 20000)
    inside = spatial.points_in_polygon_mask(lats, lons, _CONCAVE_PLA, _CONCAVE_PLO)
    cells = s2.cell_ids(lats, lons, 10)
    ids, interior = s2.polygon_cover_cells(_CONCAVE_PLA, _CONCAVE_PLO, 10)
    cover = set(ids.tolist())
    assert all(int(c) in cover for c in cells[inside])
    interior_cells = set(ids[interior].tolist())
    claimed = np.fromiter(
        (int(c) in interior_cells for c in cells), dtype=bool, count=len(cells)
    )
    assert interior.any() and claimed.any()
    assert inside[claimed].all()  # interior claim is conservative


def test_pip_join_interior_fastpath_equivalence(spark):
    """The interior fast path must not change join results: Spark PIP
    join == brute-force ray cast on a concave continent polygon."""
    rng = np.random.default_rng(31)
    lats = rng.uniform(30.0, 75.0, 2000)
    lons = rng.uniform(-15.0, 45.0, 2000)
    expect = {
        i
        for i, ok in enumerate(
            spatial.points_in_polygon_mask(lats, lons, _CONCAVE_PLA, _CONCAVE_PLO)
        )
        if ok
    }
    pts = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(lats, lons))],
        "point_id long, lat double, lon double",
    )
    out = spatial.point_in_polygon_join(
        pts, [{"polygon_id": "L", "lats": _CONCAVE_PLA, "lons": _CONCAVE_PLO}],
        level=9,
    )
    assert {r.point_id for r in out.collect()} == expect


class TestSlippyTiles:
    def test_published_anchors(self, spark):
        from opentopodata_spark.operators import spatial

        df = spark.createDataFrame(
            [(1, 52.51628, 13.37771),   # Berlin (OSM wiki example)
             (2, 41.85, -87.65),        # Chicago (Bing quadkey docs)
             (3, 85.3, -180.0),         # clamps into tile (0, 0)
             (4, -85.3, 179.999999)],   # clamps into the last tile
            "id long, lat double, lon double",
        )
        got = {r.id: r for r in spatial.with_slippy_tile(df, 10).collect()}
        assert (got[1].tile_x, got[1].tile_y) == (550, 335)
        assert (got[3].tile_x, got[3].tile_y) == (0, 0)
        assert (got[4].tile_x, got[4].tile_y) == (1023, 1023)
        assert got[4].quadkey == "3" * 10
        # Bing's documented convention example: tile (3, 5) at level 3
        # has quadkey "213"; (-55, -20) falls in that tile. Chicago's
        # (2, 2) follows as "030".
        g3 = {r.id: r for r in spatial.with_slippy_tile(df, 3).collect()}
        assert (g3[2].tile_x, g3[2].tile_y) == (2, 2)
        assert g3[2].quadkey == "030"
        df35 = spark.createDataFrame([(1, -55.0, -20.0)],
                                     "id long, lat double, lon double")
        r35 = spatial.with_slippy_tile(df35, 3).collect()[0]
        assert (r35.tile_x, r35.tile_y, r35.quadkey) == (3, 5, "213")

    def test_quadkey_prefix_is_parent(self, spark):
        """Pyramid invariant: the zoom-z quadkey of a point is a prefix
        of its zoom-(z+k) quadkey — substr rollups are exact."""
        from opentopodata_spark.operators import spatial

        rng = np.random.default_rng(99)
        rows = [(i, float(la), float(lo)) for i, (la, lo) in enumerate(
            zip(rng.uniform(-84, 84, 50), rng.uniform(-179, 179, 50)))]
        df = spark.createDataFrame(rows, "id long, lat double, lon double")
        q12 = {r.id: r.quadkey
               for r in spatial.with_slippy_tile(df, 12).collect()}
        q7 = {r.id: r.quadkey
              for r in spatial.with_slippy_tile(df, 7).collect()}
        for i in q12:
            assert q12[i].startswith(q7[i])
            assert len(q12[i]) == 12 and len(q7[i]) == 7

    def test_tile_bounds_roundtrip(self, spark):
        """Every point falls inside its own tile's geographic bounds
        (inverse Web-Mercator of the tile box)."""
        from opentopodata_spark.operators import spatial

        rng = np.random.default_rng(7)
        rows = [(i, float(la), float(lo)) for i, (la, lo) in enumerate(
            zip(rng.uniform(-80, 80, 60), rng.uniform(-179, 179, 60)))]
        df = spark.createDataFrame(rows, "id long, lat double, lon double")
        z, n = 9, 2**9
        for r in spatial.with_slippy_tile(df, z).collect():
            la, lo = rows[r.id][1], rows[r.id][2]
            lon_w = r.tile_x / n * 360.0 - 180.0
            lon_e = (r.tile_x + 1) / n * 360.0 - 180.0
            lat_n = np.degrees(np.arctan(np.sinh(
                np.pi * (1 - 2 * r.tile_y / n))))
            lat_s = np.degrees(np.arctan(np.sinh(
                np.pi * (1 - 2 * (r.tile_y + 1) / n))))
            assert lon_w <= lo < lon_e + 1e-9
            assert lat_s - 1e-9 <= la <= lat_n + 1e-9

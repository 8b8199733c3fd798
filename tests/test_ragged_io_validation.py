"""to_ragged_array/from_ragged_array parity (reference
shapely/_ragged_array.py docstring behaviors) + validation + vectorized
WKB point kernels."""

from __future__ import annotations

import numpy as np
import pytest

from engine.geo import ragged_io, validation, wkb
from engine.geo.geom import GeomType, from_wkt, to_wkt

P = from_wkt


def roundtrip(wkts):
    t, coords, offs = ragged_io.to_ragged_array([P(w) for w in wkts])
    back = ragged_io.from_ragged_array(t, coords, offs)
    return t, [to_wkt(g) for g in back]


def test_points_no_offsets():
    t, coords, offs = ragged_io.to_ragged_array([P("POINT (1 2)"), P("POINT EMPTY")])
    assert t == GeomType.POINT and offs == ()
    # empty point encoded as NaN row (_ragged_array.py:55-61)
    assert np.isnan(coords[1]).all()
    _, wkts = roundtrip(["POINT (1 2)", "POINT EMPTY"])
    assert wkts == ["POINT (1 2)", "POINT EMPTY"]


def test_mixed_promotes_to_multi():
    # _ragged_array.py:309-318: mixed single/multi of same family
    t, wkts = roundtrip(["POINT (0 0)", "MULTIPOINT ((1 1), (2 2))"])
    assert t == GeomType.MULTIPOINT
    assert wkts == ["MULTIPOINT ((0 0))", "MULTIPOINT ((1 1), (2 2))"]


def test_linestrings_one_offset():
    t, coords, offs = ragged_io.to_ragged_array(
        [P("LINESTRING (0 0, 1 1)"), P("LINESTRING (2 2, 3 3, 4 4)")]
    )
    assert t == GeomType.LINESTRING and len(offs) == 1
    assert list(offs[0]) == [0, 2, 5]
    assert offs[0].dtype == np.int32  # int32 preferred (:66-73)


def test_polygons_two_offsets():
    w = [
        "POLYGON ((0 0, 4 0, 4 4, 0 0))",
        "POLYGON ((10 10, 20 10, 20 20, 10 10), (12 12, 13 12, 12 13, 12 12))",
    ]
    t, wkts = roundtrip(w)
    assert t == GeomType.POLYGON
    assert wkts == w


def test_multipolygons_three_offsets():
    w = ["MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
         "POLYGON ((9 9, 10 9, 10 10, 9 9))"]
    t, coords, offs = ragged_io.to_ragged_array([P(x) for x in w])
    assert t == GeomType.MULTIPOLYGON and len(offs) == 3
    back = ragged_io.from_ragged_array(t, coords, offs)
    assert to_wkt(back[1]) == "MULTIPOLYGON (((9 9, 10 9, 10 10, 9 9)))"


def test_collections_rejected_and_mixed_families():
    with pytest.raises(ValueError):
        ragged_io.to_ragged_array([P("GEOMETRYCOLLECTION (POINT (0 0))")])
    with pytest.raises(ValueError):
        ragged_io.to_ragged_array([P("POINT (0 0)"), P("LINESTRING (0 0, 1 1)")])


def test_explain_validity_and_make_valid():
    assert validation.explain_validity(P("POINT (0 0)")) == "Valid Geometry"
    assert validation.explain_validity(None) == "Null geometry"
    # CW shell with reversed hole orientation: repairable by reorientation
    bad = P("POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))")
    fixed = validation.make_valid(bad)
    from engine.geo import predicates

    assert predicates.is_valid(fixed)


def test_make_valid_reference_table():
    """Ported reference expectations (tests/test_constructive.py:191-310):
    bowtie → two triangles; zero-area L-polygon → linework
    MULTILINESTRING / structure LINESTRING / structure-drop POLYGON EMPTY."""
    from engine.geo.constructive import normalize
    from engine.geo.geom import to_wkt

    def norm(g):
        return to_wkt(normalize(g))

    bow = P("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))")
    want = norm(P("MULTIPOLYGON (((1 1, 2 2, 2 0, 1 1)), ((0 0, 0 2, 1 1, 0 0)))"))
    assert norm(validation.make_valid(bow)) == want
    assert norm(validation.make_valid(bow, method="structure")) == want

    L = P("POLYGON ((0 0, 1 1, 1 2, 1 1, 0 0))")
    assert norm(validation.make_valid(L)) == norm(
        P("MULTILINESTRING ((1 1, 1 2), (0 0, 1 1))")
    )
    assert to_wkt(validation.make_valid(L, method="structure")) == (
        "LINESTRING (0 0, 1 1, 1 2, 1 1, 0 0)"
    )
    assert to_wkt(
        validation.make_valid(L, method="structure", keep_collapsed=False)
    ) == "POLYGON EMPTY"

    # top-level make_valid returns a NEW equal geometry even when valid
    # (the shapely.validation wrapper adds the identity shortcut)
    pt = P("POINT (2 3)")
    out = validation.make_valid(pt)
    assert out is not pt and to_wkt(out) == "POINT (2 3)"
    assert validation.make_valid(None) is None
    # linework + keep_collapsed=False is rejected like the reference
    import pytest as _pytest

    with _pytest.raises(ValueError):
        validation.make_valid(bow, method="linework", keep_collapsed=False)
    with _pytest.raises(ValueError):
        validation.make_valid(bow, method="nope")


def test_make_valid_array_mixed():
    from engine.geo import predicates

    arr = [
        P("POLYGON ((0 0, 2 2, 0 2, 0 0))"),  # valid
        P("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))"),  # bowtie
        None,
    ]
    out = validation.make_valid(arr)
    assert predicates.is_valid(out[0]) and predicates.is_valid(out[1])
    assert out[1].type_id.name == "MULTIPOLYGON"
    assert out[2] is None


def test_vectorized_pointz_wkb_and_srid():
    """POINT Z column kernels agree with the scalar encoder; EWKB SRID
    round-trips through to_wkb(include_srid)/from_wkb into set_srid
    metadata (reference io.py:124,167 semantics)."""
    from engine.geo.coverage import get_srid, set_srid

    x = np.array([1.0, 2.5])
    y = np.array([4.0, -5.5])
    z = np.array([7.0, 8.25])
    buf = wkb.points_to_wkb_z_np(x, y, z)
    assert buf.shape == (2, 29)
    assert buf[0].tobytes() == wkb.to_wkb(P("POINT Z (1 4 7)"), flavor="iso")
    bx, by, bz = wkb.points_from_wkb_z_np(buf)
    assert np.array_equal(bx, x) and np.array_equal(by, y) and np.array_equal(bz, z)

    g = set_srid(P("POINT Z (1 2 3)"), 4326)
    b = wkb.to_wkb(g, flavor="extended", include_srid=True)
    back = wkb.from_wkb(b)
    assert get_srid(back) == 4326
    from engine.geo.geom import to_wkt

    assert to_wkt(back) == "POINT Z (1 2 3)"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        # iso flavor carries no SRID (default flavor is now "extended")
        wkb.to_wkb(g, include_srid=True, flavor="iso")


def test_vectorized_point_wkb():
    x = np.array([1.0, 2.5, -3.25])
    y = np.array([4.0, -5.5, 6.125])
    buf = wkb.points_to_wkb_np(x, y)
    assert buf.shape == (3, 21)
    # row 0 must equal the scalar encoder's bytes
    assert buf[0].tobytes() == wkb.to_wkb(P("POINT (1 4)"))
    bx, by = wkb.points_from_wkb_np(buf)
    assert np.array_equal(bx, x) and np.array_equal(by, y)

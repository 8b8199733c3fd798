"""Z/M coordinate conformance — ported expected values from the
reference's docstrings and tests (shapely/_geometry.py:100-362, 952-1016;
tests/test_geometry.py:150-163; _ragged_array.py:279-285).

Analysis kernels remain planar (GEOS parity): predicates/overlays ignore
Z; Z/M flow through creation, accessors, WKT/WKB, ragged IO, force_2d/3d.
"""

from __future__ import annotations

import numpy as np
import pytest

from engine import compat as shapely
from engine.geo.geom import Geom, from_wkt, to_wkt


def P(*args):
    return Geom.point(*args)


# ----------------------------------------------------------- accessors
def test_get_z_reference_examples():
    # _geometry.py:347-354
    assert shapely.get_z(P(1, 2, 3)) == 3.0
    assert np.isnan(shapely.get_z(P(1, 2)))
    mp = from_wkt("MULTIPOINT Z ((1 1 1), (2 2 2))")
    assert np.isnan(shapely.get_z(mp))


def test_get_m_reference_examples():
    # _geometry.py:362+ — m of XYM / XYZM points; nan for XY/XYZ
    assert shapely.get_m(from_wkt("POINT M (1 2 4)")) == 4.0
    assert shapely.get_m(from_wkt("POINT ZM (1 2 3 4)")) == 4.0
    assert np.isnan(shapely.get_m(from_wkt("POINT Z (1 2 3)")))
    assert np.isnan(shapely.get_m(P(1, 2)))


def test_get_x_y_non_point_nan():
    ls = from_wkt("LINESTRING (0 0, 1 1)")
    assert np.isnan(shapely.get_x(ls)) and np.isnan(shapely.get_y(ls))


def test_get_coordinate_dimension():
    # tests/test_geometry.py:155-163 + XYM/XYZM extension
    vals = shapely.get_coordinate_dimension(
        [P(0, 0), P(0, 0, 1), None,
         from_wkt("POINT M (1 2 3)"), from_wkt("POINT ZM (1 2 3 4)")]
    ).tolist()
    assert vals == [2, 3, -1, 3, 4]


def test_get_dimensions_all_types():
    # tests/test_geometry.py:150-152 pattern (type-based, empties keep
    # their type's dimension; empty collections and None → -1)
    from tests.common import all_types

    got = shapely.get_dimensions(list(all_types) + [None]).tolist()
    assert got == [0, 1, 1, 2, 0, 1, 2, 1, -1]
    assert shapely.get_dimensions(from_wkt("GEOMETRYCOLLECTION EMPTY")) == -1
    assert shapely.get_dimensions(from_wkt("POINT EMPTY")) == 0


def test_has_z_has_m():
    # predicates.py:46,80
    assert not shapely.has_z(P(0, 0))
    assert shapely.has_z(P(0, 0, 1))
    assert not shapely.has_m(P(0, 0, 1))
    assert shapely.has_m(from_wkt("POINT M (1 2 3)"))
    assert shapely.has_z(from_wkt("POINT ZM (1 2 3 4)"))
    assert shapely.has_m(from_wkt("POINT ZM (1 2 3 4)"))
    got = shapely.has_z([P(0, 0), P(1, 1, 5)])
    assert got.tolist() == [False, True]


# ------------------------------------------------------- force_2d / 3d
def test_force_3d_reference_examples():
    # _geometry.py:1002-1011
    assert to_wkt(shapely.force_3d(P(0, 0), z=3)) == "POINT Z (0 0 3)"
    assert to_wkt(shapely.force_3d(P(0, 0, 0), z=3)) == "POINT Z (0 0 0)"
    ls = from_wkt("LINESTRING (0 0, 0 1, 1 1)")
    assert to_wkt(shapely.force_3d(ls)) == "LINESTRING Z (0 0 0, 0 1 0, 1 1 0)"
    assert shapely.force_3d(None) is None
    with pytest.raises(ValueError):
        shapely.force_3d(P(0, 0), z=float("nan"))


def test_force_2d_reference_examples():
    # _geometry.py:966
    assert to_wkt(shapely.force_2d(P(0, 0, 1))) == "POINT (0 0)"
    assert to_wkt(shapely.force_2d(from_wkt(
        "POLYGON Z ((0 0 1, 1 0 1, 1 1 1, 0 0 1))"
    ))) == "POLYGON ((0 0, 1 0, 1 1, 0 0))"
    g = shapely.force_2d(from_wkt("MULTIPOINT Z ((1 1 1), (2 2 2))"))
    assert to_wkt(g) == "MULTIPOINT ((1 1), (2 2))"
    assert shapely.force_2d(None) is None


# ------------------------------------------------------------ WKT / WKB
@pytest.mark.parametrize("wkt", [
    "POINT Z (1 2 3)",
    "POINT M (1 2 3)",
    "POINT ZM (1 2 3 4)",
    "LINESTRING Z (0 0 0, 1 1 5)",
    "POLYGON Z ((0 0 1, 1 0 1, 1 1 1, 0 0 1))",
    "MULTIPOINT Z ((1 1 1), (2 2 2))",
    "MULTILINESTRING Z ((0 0 0, 1 1 1))",
    "MULTIPOLYGON Z (((0 0 1, 1 0 1, 1 1 1, 0 0 1)))",
    "GEOMETRYCOLLECTION Z (POINT Z (1 2 3))",
    "POINT Z EMPTY",
])
def test_wkt_zm_roundtrip(wkt):
    assert to_wkt(from_wkt(wkt)) == wkt


def test_wkt_bare_three_ordinates_is_z():
    # GEOS reader: "POINT (1 2 3)" → XYZ
    g = from_wkt("POINT (1 2 3)")
    assert g.has_z and to_wkt(g) == "POINT Z (1 2 3)"


@pytest.mark.parametrize("flavor", ["iso", "extended"])
@pytest.mark.parametrize("wkt", [
    "POINT Z (1 2 3)", "POINT M (1 2 3)", "POINT ZM (1 2 3 4)",
    "LINESTRING Z (0 0 0, 1 1 5)",
    "POLYGON Z ((0 0 1, 1 0 1, 1 1 1, 0 0 1))",
    "MULTIPOINT Z ((1 1 1), (2 2 2))",
])
def test_wkb_zm_roundtrip(wkt, flavor):
    from engine.geo.wkb import from_wkb, to_wkb

    g = from_wkt(wkt)
    assert to_wkt(from_wkb(to_wkb(g, flavor=flavor))) == wkt


def test_wkb_iso_code_offsets():
    # ISO codes: +1000 Z, +2000 M, +3000 ZM (io.py:157)
    from engine.geo.wkb import to_wkb

    assert to_wkb(from_wkt("POINT Z (1 2 3)"), flavor="iso")[1:5] == (1001).to_bytes(4, "little")
    assert to_wkb(from_wkt("POINT M (1 2 3)"), flavor="iso")[1:5] == (2001).to_bytes(4, "little")
    assert to_wkb(from_wkt("POINT ZM (1 2 3 4)"), flavor="iso")[1:5] == (3001).to_bytes(4, "little")


# --------------------------------------------------------- coordinates
def test_get_coordinates_include_z():
    ls = from_wkt("LINESTRING Z (0 1 2, 3 4 5)")
    assert shapely.get_coordinates(ls).tolist() == [[0, 1], [3, 4]]
    assert shapely.get_coordinates(ls, include_z=True).tolist() == [
        [0, 1, 2], [3, 4, 5]
    ]
    # 2-D inputs pad NaN z (_ragged/coordinates semantics)
    got = shapely.get_coordinates(P(1, 2), include_z=True)
    assert got[0][0] == 1 and got[0][1] == 2 and np.isnan(got[0][2])


def test_set_coordinates_xy_input_forces_2d():
    # reference coordinates.py:398-404: width-2 coords make the output
    # 2-D; width-3 preserves each geometry's own dimensionality
    ls = from_wkt("LINESTRING Z (0 1 2, 3 4 5)")
    out = shapely.set_coordinates(ls, np.array([[9.0, 9.0], [8.0, 8.0]]))
    assert to_wkt(out) == "LINESTRING (9 9, 8 8)"
    out3 = shapely.set_coordinates(
        ls, np.array([[9.0, 9.0, 7.0], [8.0, 8.0, 6.0]])
    )
    assert to_wkt(out3) == "LINESTRING Z (9 9 7, 8 8 6)"


def test_transform_include_z():
    ls = from_wkt("LINESTRING Z (0 1 2, 3 4 5)")
    flat = shapely.transform(ls, lambda c: c + 1)
    assert to_wkt(flat) == "LINESTRING (1 2, 4 5)"  # include_z=False drops z
    kept = shapely.transform(ls, lambda c: c + 1, include_z=True)
    assert to_wkt(kept) == "LINESTRING Z (1 2 3, 4 5 6)"


# -------------------------------------------------------------- ragged
def test_ragged_z_roundtrip():
    from engine.geo.ragged_io import from_ragged_array, to_ragged_array

    gs = [from_wkt("POINT Z (1 2 3)"), from_wkt("POINT Z (4 5 6)")]
    t, c, o = to_ragged_array(gs)
    assert c.shape == (2, 3)
    back = from_ragged_array(t, c, o)
    assert [to_wkt(g) for g in back] == ["POINT Z (1 2 3)", "POINT Z (4 5 6)"]

    polys = [from_wkt("POLYGON Z ((0 0 1, 1 0 2, 1 1 3, 0 0 1))")]
    t2, c2, o2 = to_ragged_array(polys)
    assert c2.shape[1] == 3
    assert to_wkt(from_ragged_array(t2, c2, o2)[0]) == to_wkt(polys[0])


def test_ragged_mixed_dims_pads_nan():
    from engine.geo.ragged_io import to_ragged_array

    t, c, o = to_ragged_array([P(1, 2), P(1, 2, 3)])
    assert c.shape == (2, 3)
    assert np.isnan(c[0, 2]) and c[1, 2] == 3.0


def test_ragged_include_z_false_forces_2d():
    from engine.geo.ragged_io import to_ragged_array

    t, c, o = to_ragged_array([P(1, 2, 3)], include_z=False)
    assert c.shape == (1, 2)


# ---------------------------------------------------- creation / planar
def test_points_creation_with_z():
    pts = shapely.points(np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]))
    assert [to_wkt(p) for p in pts] == ["POINT Z (1 2 3)", "POINT Z (4 5 6)"]
    p = shapely.points([1.0, 2.0, 3.0])
    assert to_wkt(p) == "POINT Z (1 2 3)"


def test_predicates_ignore_z():
    # GEOS parity: the analysis plane is XY
    a = from_wkt("POLYGON Z ((0 0 9, 4 0 9, 4 4 9, 0 4 9, 0 0 9))")
    b = from_wkt("POINT Z (2 2 -100)")
    assert shapely.contains(a, b)
    assert shapely.area(a) == 16.0
    assert shapely.bounds(a).tolist() == [0, 0, 4, 4]

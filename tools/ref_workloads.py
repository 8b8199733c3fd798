"""Run the reference's own asv benchmark workload SHAPES on our kernels.

Workload definitions from /root/reference/benchmarks/benchmarks.py
(sizes only — upstream checks in no numbers; shapely/GEOS is not
installed in this sandbox, so this records OUR absolute times on the
SAME shapes for the single-node comparison in BASELINE.md).
Pure kernel timings — no Ray.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from engine.geo import predicates  # noqa: E402
from engine.geo.constructive import buffer as geo_buffer  # noqa: E402
from engine.geo.constructive import convex_hull  # noqa: E402
from engine.geo.triangulate import voronoi_polygons  # noqa: E402
from engine.geo.geom import Geom, GeomType  # noqa: E402
from engine.geo.io import from_wkb, from_wkt, to_wkb, to_wkt  # noqa: E402
from engine.geo.prepared import PreparedPolygons  # noqa: E402
from engine.geo.ragged import PolygonArray  # noqa: E402
from engine.geo.strtree import STRtree  # noqa: E402


def timed(name, fn, out):
    """min of 2 runs (first-touch page faults in this sandbox VM cost
    ~200µs/page; warm numbers reflect steady state — see BASELINE.md)."""
    best, res = float("inf"), None
    for _ in range(2):
        t0 = time.perf_counter()
        res = fn()
        best = min(best, time.perf_counter() - t0)
    out[name] = round(best, 4)
    return res


def main():
    out = {}
    rng = np.random.default_rng(0)  # benchmarks.py:15 seeds numpy

    # benchmarks.py:18-32 — 100,000 points vs one 100-vertex polygon
    pts_xy = rng.random((100_000, 2)) * 2 - 1
    ang = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    poly_ring = np.column_stack([np.cos(ang), np.sin(ang)])
    polygon = Geom.polygon(poly_ring)
    points = [Geom.point(x, y) for x, y in pts_xy]
    timed("contains_500_pts_scalar_loop",
          lambda: [predicates.contains(polygon, p) for p in points[:500]], out)
    # the engine's intended batch form (contains_xy over the whole array):
    pp = PreparedPolygons(PolygonArray.from_geoms([polygon]))
    timed("contains_100k_pts_batch",
          lambda: pp.query_points(pts_xy[:, 0], pts_xy[:, 1], "contains"), out)

    # benchmarks.py:35-53 — WKT/WKB io of 10,000 polygons x 100 pts
    polys_coords = rng.random((10_000, 100, 2))
    polys = [Geom.polygon(c) for c in polys_coords[:1000]]
    wkbs = timed("to_wkb_1k_100pt_polys", lambda: [to_wkb(p) for p in polys], out)
    timed("from_wkb_1k", lambda: [from_wkb(b) for b in wkbs], out)
    wkts = timed("to_wkt_1k", lambda: [to_wkt(p) for p in polys], out)
    timed("from_wkt_1k", lambda: [from_wkt(w) for w in wkts], out)

    # benchmarks.py:78-104 — constructive ops on 10,000 points
    mp = Geom(GeomType.MULTIPOINT,
              parts=[Geom.point(x, y) for x, y in rng.random((10_000, 2)) * 100])
    timed("convex_hull_10k_points", lambda: convex_hull(mp), out)
    mp_small = Geom(GeomType.MULTIPOINT,
                    parts=[Geom.point(x, y) for x, y in rng.random((200, 2)) * 100])
    timed("voronoi_200_points", lambda: voronoi_polygons(mp_small), out)
    timed("voronoi_10k_points", lambda: voronoi_polygons(mp), out)
    timed("buffer_200_points_q16",
          lambda: [geo_buffer(p, 1.0, quad_segs=16) for p in mp_small.parts], out)

    # benchmarks.py:214-343 — STRtree build + query, 2,000 x 2,000
    tree_polys = [
        Geom.box(x, y, x + 0.1, y + 0.1) for x, y in rng.random((2000, 2)) * 100
    ]
    query_pts = [Geom.point(x, y) for x, y in rng.random((2000, 2)) * 100]
    tree = timed("strtree_build_2000", lambda: STRtree(tree_polys), out)
    timed("strtree_query_intersects_2000",
          lambda: tree.query(query_pts, predicate="intersects"), out)
    timed("strtree_nearest_2000", lambda: tree.nearest(query_pts), out)

    print(json.dumps(out))


if __name__ == "__main__":
    main()

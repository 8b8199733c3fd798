"""GeoArrow ragged columnar geometry arrays.

The reference's `shapely/_ragged_array.py:159` (`to_ragged_array`) emits
"the in-memory layout of the variable size list arrays defined by Apache
Arrow, as specified for geometries by the GeoArrow project": one
contiguous (n,2) float64 coord block plus int offset arrays.  In our
engine that layout is the PRIMARY representation — kernels consume it
directly and Arrow conversion is (near) zero-copy, the idiomatic
inversion of the reference's Arrow→GEOS→Arrow round-trip.

Offset conventions mirror `_ragged_array.py:124-136`: polygon column =
``list<list<fixed_size_list<double, 2>>>`` (polygon → rings → closed
coord sequences).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.geo.geom import Geom, GeomType


class PolygonArray:
    """Columnar array of polygons (one shell + holes each).

    coords        (N, 2) float64 — all ring coordinates, rings closed
    ring_offsets  (R+1,) int64   — coords per ring
    poly_offsets  (P+1,) int64   — rings per polygon
    """

    __slots__ = ("coords", "ring_offsets", "poly_offsets")

    def __init__(self, coords, ring_offsets, poly_offsets):
        self.coords = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
        self.ring_offsets = np.asarray(ring_offsets, dtype=np.int64)
        self.poly_offsets = np.asarray(poly_offsets, dtype=np.int64)

    def __len__(self) -> int:
        return len(self.poly_offsets) - 1

    # ----------------------------------------------------------- builders
    @classmethod
    def from_geoms(cls, geoms) -> "PolygonArray":
        """Build from Geom polygons (multipolygons are flattened per part
        caller-side; see from_ragged parity in _ragged_array.py:287-328)."""
        coords = []
        ring_off = [0]
        poly_off = [0]
        n = 0
        for g in geoms:
            rings = g.rings if (g is not None and g.type_id == GeomType.POLYGON) else []
            for r in rings:
                coords.append(r)
                n += len(r)
                ring_off.append(n)
            poly_off.append(len(ring_off) - 1)
        c = np.vstack(coords) if coords else np.empty((0, 2))
        return cls(c, np.asarray(ring_off), np.asarray(poly_off))

    @classmethod
    def from_bounds(cls, xmin, ymin, xmax, ymax) -> "PolygonArray":
        """Vectorized axis-aligned boxes (creation.py:448 `box`, ccw)."""
        xmin, ymin, xmax, ymax = (
            np.atleast_1d(np.asarray(a, dtype=np.float64)) for a in (xmin, ymin, xmax, ymax)
        )
        p = len(xmin)
        coords = np.empty((p * 5, 2))
        coords[0::5] = np.column_stack([xmax, ymin])
        coords[1::5] = np.column_stack([xmax, ymax])
        coords[2::5] = np.column_stack([xmin, ymax])
        coords[3::5] = np.column_stack([xmin, ymin])
        coords[4::5] = np.column_stack([xmax, ymin])
        ring_off = np.arange(p + 1, dtype=np.int64) * 5
        poly_off = np.arange(p + 1, dtype=np.int64)
        return cls(coords, ring_off, poly_off)

    # ----------------------------------------------------------- accessors
    def rings_of(self, i: int) -> list[np.ndarray]:
        out = []
        for r in range(self.poly_offsets[i], self.poly_offsets[i + 1]):
            out.append(self.coords[self.ring_offsets[r] : self.ring_offsets[r + 1]])
        return out

    def get(self, i: int) -> Geom:
        rings = self.rings_of(i)
        return Geom(GeomType.POLYGON, rings=[np.array(r) for r in rings])

    def to_geoms(self) -> list[Geom]:
        return [self.get(i) for i in range(len(self))]

    # ----------------------------------------------------------- measures
    def bounds(self) -> np.ndarray:
        """(P, 4) xmin/ymin/xmax/ymax; NaN rows for empty polygons
        (measurement.py:85 semantics)."""
        p = len(self)
        out = np.full((p, 4), np.nan)
        counts = np.diff(self.ring_offsets)
        # coords per polygon
        poly_coord_start = self.ring_offsets[self.poly_offsets[:-1]]
        poly_coord_end = self.ring_offsets[self.poly_offsets[1:]]
        nonempty = poly_coord_end > poly_coord_start
        if not nonempty.any():
            return out
        idx = np.flatnonzero(nonempty)
        starts = poly_coord_start[idx]
        x, y = self.coords[:, 0], self.coords[:, 1]
        out[idx, 0] = np.minimum.reduceat(x, starts)
        out[idx, 1] = np.minimum.reduceat(y, starts)
        out[idx, 2] = np.maximum.reduceat(x, starts)
        out[idx, 3] = np.maximum.reduceat(y, starts)
        # reduceat runs to the next start; mask segments that span beyond a
        # polygon's end only when polygons are non-contiguous (never here:
        # rings are stored contiguously per polygon) — but the LAST segment
        # runs to array end, which is correct for the last polygon.
        # For interior empties the start==next start gives the next value;
        # already masked via `nonempty`.
        return out

    def signed_area(self) -> np.ndarray:
        """(P,) shoelace area: shell orientation sign, holes subtract
        (kernel form of the reference's algorithms/cga.py:8-16)."""
        x, y = self.coords[:, 0], self.coords[:, 1]
        cross = x[:-1] * y[1:] - x[1:] * y[:-1]
        cross = np.append(cross, 0.0)
        # zero the wrap-around terms at ring ends
        ends = self.ring_offsets[1:] - 1
        cross[ends] = 0.0
        csum = np.concatenate([[0.0], np.cumsum(cross)])
        ring_area = 0.5 * (csum[self.ring_offsets[1:]] - csum[self.ring_offsets[:-1]])
        # first ring of each polygon is the shell; holes subtract |area|
        p = len(self)
        out = np.zeros(p)
        for i in range(p):  # small P (polygon layers); ring loop vectorized above
            r0, r1 = self.poly_offsets[i], self.poly_offsets[i + 1]
            if r1 > r0:
                shell = ring_area[r0]
                holes = np.abs(ring_area[r0 + 1 : r1]).sum()
                out[i] = shell - np.sign(shell or 1) * holes
        return out

    def area(self) -> np.ndarray:
        return np.abs(self.signed_area())

    def perimeter(self) -> np.ndarray:
        d = np.sqrt((np.diff(self.coords, axis=0) ** 2).sum(axis=1))
        d = np.append(d, 0.0)
        d[self.ring_offsets[1:] - 1] = 0.0
        csum = np.concatenate([[0.0], np.cumsum(d)])
        ring_len = csum[self.ring_offsets[1:]] - csum[self.ring_offsets[:-1]]
        out = np.zeros(len(self))
        np.add.at(
            out,
            np.repeat(np.arange(len(self)), np.diff(self.poly_offsets)),
            ring_len,
        )
        return out

    # --------------------------------------------------------------- slices
    def take(self, idx: np.ndarray) -> "PolygonArray":
        """Gather a subset of polygons (vectorized offset rebase)."""
        idx = np.asarray(idx, dtype=np.int64)
        r0 = self.poly_offsets[idx]
        r1 = self.poly_offsets[idx + 1]
        nrings = r1 - r0
        ring_sel = np.repeat(r0, nrings) + (
            np.arange(int(nrings.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(nrings) - nrings, nrings)
        )
        ring_lens = self.ring_offsets[ring_sel + 1] - self.ring_offsets[ring_sel]
        starts = self.ring_offsets[ring_sel]
        total = int(ring_lens.sum())
        coord_sel = np.repeat(starts, ring_lens) + (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(ring_lens) - ring_lens, ring_lens)
        )
        ring_off = np.concatenate([[0], np.cumsum(ring_lens)]).astype(np.int64)
        poly_off = np.concatenate([[0], np.cumsum(nrings)]).astype(np.int64)
        return PolygonArray(self.coords[coord_sel], ring_off, poly_off)

    # --------------------------------------------------------------- blobs
    #
    # Per-polygon self-contained byte blobs — the wire format polygons
    # ride through cell-partitioned shuffles (celljoin.py).  Layout:
    #   int64 n_rings | int64 ring_len × n_rings | float64 coords (xy)
    def to_blobs(self) -> pa.Array:
        """Serialize every polygon to its shuffle blob, returned as a
        zero-copy-constructed Arrow binary array (one from_buffers call;
        the per-polygon loop does only slice memcpy, no per-coord work)."""
        p = len(self)
        nr = np.diff(self.poly_offsets)
        ring_lens = np.diff(self.ring_offsets)
        # header stream: for each poly, [n_rings, ring_len...]
        header = np.insert(ring_lens, self.poly_offsets[:-1], nr).astype(np.int64)
        hlen = 8 * (1 + nr)
        c0 = self.ring_offsets[self.poly_offsets[:-1]]
        c1 = self.ring_offsets[self.poly_offsets[1:]]
        clen = 16 * (c1 - c0)
        blob_len = hlen + clen
        off = np.concatenate([[0], np.cumsum(blob_len)]).astype(np.int64)
        values = np.empty(int(off[-1]), dtype=np.uint8)
        hbytes = header.view(np.uint8)
        cbytes = np.ascontiguousarray(self.coords).reshape(-1).view(np.uint8)
        hoff = np.concatenate([[0], np.cumsum(hlen)]).astype(np.int64)
        coff = 16 * c0
        for i in range(p):
            s = off[i]
            values[s : s + hlen[i]] = hbytes[hoff[i] : hoff[i + 1]]
            values[s + hlen[i] : off[i + 1]] = cbytes[coff[i] : coff[i] + clen[i]]
        return pa.Array.from_buffers(
            pa.large_binary(), p,
            [None, pa.py_buffer(off.tobytes()), pa.py_buffer(values.tobytes())],
        )

    @classmethod
    def from_blobs(cls, blobs) -> "PolygonArray":
        """Rebuild a PolygonArray from shuffle blobs (group-local).

        Accepts an Arrow binary array/chunked array or a list of bytes."""
        if isinstance(blobs, pa.ChunkedArray):
            blobs = blobs.combine_chunks()
        if isinstance(blobs, pa.Array):
            blobs = blobs.to_pylist()
        coords_parts = []
        ring_off = [0]
        poly_off = [0]
        n = 0
        for blob in blobs:
            buf = memoryview(blob)
            n_rings = int(np.frombuffer(buf[:8], dtype=np.int64)[0])
            ring_lens = np.frombuffer(buf[8 : 8 * (1 + n_rings)], dtype=np.int64)
            coords = np.frombuffer(buf[8 * (1 + n_rings) :], dtype=np.float64).reshape(-1, 2)
            coords_parts.append(coords)
            for rl in ring_lens:
                n += int(rl)
                ring_off.append(n)
            poly_off.append(len(ring_off) - 1)
        c = np.vstack(coords_parts) if coords_parts else np.empty((0, 2))
        return cls(c, np.asarray(ring_off), np.asarray(poly_off))

    # --------------------------------------------------------------- arrow
    ARROW_TYPE = pa.list_(pa.list_(pa.list_(pa.float64(), 2)))

    def to_arrow(self) -> pa.Array:
        inner = pa.FixedSizeListArray.from_arrays(
            pa.array(self.coords.reshape(-1), type=pa.float64()), 2
        )
        rings = pa.ListArray.from_arrays(
            pa.array(self.ring_offsets, type=pa.int32()), inner
        )
        polys = pa.ListArray.from_arrays(
            pa.array(self.poly_offsets, type=pa.int32()), rings
        )
        return polys

    @classmethod
    def from_arrow(cls, arr: pa.Array) -> "PolygonArray":
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        polys = arr
        rings = polys.values
        inner = rings.values
        coords = np.asarray(inner.values, dtype=np.float64).reshape(-1, 2)
        # offsets hold ABSOLUTE indices into the (unsliced) child arrays,
        # and all accessors index absolutely, so slices need no rebasing;
        # pyarrow's .offsets of a sliced ListArray is the sliced window.
        ring_off = np.asarray(rings.offsets, dtype=np.int64)
        poly_off = np.asarray(polys.offsets, dtype=np.int64)
        return cls(coords, ring_off, poly_off)


def points_to_arrow(x: np.ndarray, y: np.ndarray) -> pa.Array:
    """Point column as fixed_size_list<double,2> (GeoArrow point)."""
    coords = np.column_stack([x, y]).reshape(-1)
    return pa.FixedSizeListArray.from_arrays(pa.array(coords, type=pa.float64()), 2)


def points_from_arrow(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = np.asarray(arr.values, dtype=np.float64).reshape(-1, 2)
    return flat[:, 0].copy(), flat[:, 1].copy()

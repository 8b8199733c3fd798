"""Ufunc-parity wrappers for the constructive surface.

The engine kernels are scalar-first; the reference exposes numpy-ufunc
semantics (arrays map elementwise, None propagates, NaN numeric
parameters yield None).  These wrappers are applied once in the compat
facade — engine-internal hot paths keep calling the raw kernels.
"""

from __future__ import annotations

import functools

import numpy as np

from engine.geo.geom import Geom


def vec1(fn):
    """Map a scalar-geometry function elementwise over object arrays;
    None propagates to None."""

    def check(g):
        if g is not None and not isinstance(g, Geom):
            raise TypeError(
                "One of the arguments is of incorrect type. "
                f"Provided value: {g!r}"
            )
        return g

    @functools.wraps(fn)
    def wrapped(geometry, *a, **k):
        if geometry is None:
            return None
        if isinstance(geometry, Geom):
            return fn(geometry, *a, **k)
        if not isinstance(geometry, (list, tuple, np.ndarray)):
            # numpy ufunc dispatch protocol: let array-like containers
            # unwrap their payload and wrap the result themselves
            auf = getattr(type(geometry), "__array_ufunc__", None)
            if auf is not None:
                res = geometry.__array_ufunc__(wrapped, "__call__",
                                               geometry, *a, **k)
                if res is NotImplemented:
                    check(geometry)
                return res
            if hasattr(geometry, "__array__"):
                geometry = np.asarray(geometry)
            else:
                check(geometry)
        arr = np.asarray(geometry, dtype=object)
        if arr.ndim == 0:
            g = check(arr[()])
            return None if g is None else fn(g, *a, **k)
        out = np.empty(arr.shape, dtype=object)
        for idx in np.ndindex(arr.shape):
            g = check(arr[idx])
            out[idx] = None if g is None else fn(g, *a, **k)
        return out

    return wrapped


def bcast_param(fn, idx, name):
    """Broadcast one numeric parameter with the geometry argument
    (ufunc semantics: ``offset_curve([g, g], [-2, -3])`` pairs
    elementwise).  ``fn`` is the fully-wrapped scalar-parameter form;
    it is invoked once per broadcast element so NaN→None handling
    applies elementwise."""

    @functools.wraps(fn)
    def wrapped(geometry, *a, **k):
        if name in k:
            v = k[name]
        elif len(a) >= idx:
            v = a[idx - 1]
        else:
            v = None
        if v is None or np.isscalar(v) or isinstance(v, Geom):
            return fn(geometry, *a, **k)
        varr = np.asarray(v, dtype=float)
        if varr.ndim == 0:
            return fn(geometry, *a, **k)
        if geometry is None or isinstance(geometry, Geom):
            garr = np.empty((), dtype=object)
            garr[()] = geometry
        else:
            garr = np.asarray(geometry, dtype=object)
        gb, vb = np.broadcast_arrays(garr, varr)
        out = np.empty(gb.shape, dtype=object)
        for pos in np.ndindex(gb.shape):
            if name in k:
                kk = dict(k)
                kk[name] = float(vb[pos])
                out[pos] = fn(gb[pos], *a, **kk)
            else:
                aa = list(a)
                aa[idx - 1] = float(vb[pos])
                out[pos] = fn(gb[pos], *aa, **k)
        return out

    return wrapped


def _nan_result(geometry):
    if geometry is None or isinstance(geometry, Geom):
        return None
    arr = np.asarray(geometry, dtype=object)
    return np.full(arr.shape, None, dtype=object)


def nan_none(fn, positions):
    """Return None (elementwise) when any listed float parameter is NaN
    (reference C kernels' behavior for buffer/simplify/snap/...).

    ``positions`` = list of (arg_index_after_geometry, name).
    """

    @functools.wraps(fn)
    def wrapped(geometry, *a, **k):
        for idx, name in positions:
            if name in k:
                v = k[name]
            elif len(a) >= idx:
                v = a[idx - 1]
            else:
                continue
            if v is None:
                continue
            try:
                if np.isscalar(v) and np.isnan(float(v)):
                    return _nan_result(geometry)
            except (TypeError, ValueError):
                continue
        return fn(geometry, *a, **k)

    return wrapped

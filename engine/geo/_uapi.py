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

"""Function decorators (reference shapely/decorators.py).

requires_geos:15 — gate a function on a minimum GEOS version (here the
compat layer's reported version); multithreading_enabled:64 — freeze
object-array arguments for the duration of the call;
deprecate_positional:97 — warn when listed parameters arrive
positionally.
"""

from __future__ import annotations

import functools
import inspect
import os
import warnings

import numpy as np

from engine.geo.errors import UnsupportedGEOSVersionError

GEOS_VERSION = (3, 13, 0)


def _current_geos_version():
    """Read the live version from the compat lib namespace so test
    monkeypatching of ``shapely.lib.geos_version`` is honored."""
    try:
        import engine.compat as _c

        return tuple(_c.lib.geos_version)
    except Exception:
        return GEOS_VERSION


class requires_geos:
    """Decorator requiring a minimum GEOS version (decorators.py:15)."""

    def __init__(self, version: str):
        if version.count(".") != 2:
            raise ValueError("Version must be <major>.<minor>.<patch> format")
        self.version = tuple(int(x) for x in version.split("."))

    def __call__(self, func):
        ok = _current_geos_version() >= self.version
        doc_build = os.environ.get("SPHINX_DOC_BUILD") == "1"
        if ok and not doc_build:
            return func
        msg = "'{}' requires at least GEOS {}.{}.{}.".format(
            func.__name__, *self.version
        )
        if ok:
            @functools.wraps(func)
            def wrapped(*args, **kwargs):
                return func(*args, **kwargs)
        else:
            @functools.wraps(func)
            def wrapped(*args, **kwargs):
                raise UnsupportedGEOSVersionError(msg)
        if wrapped.__doc__:
            doc = wrapped.__doc__
            cut = doc.find("\n\n") + 2
            indent = 0
            while cut + indent < len(doc) and doc[cut + indent] == " ":
                indent += 1
            wrapped.__doc__ = doc.replace(
                "\n\n", "\n\n" + " " * indent + f".. note:: {msg}\n\n", 1
            )
        return wrapped


def multithreading_enabled(func):
    """Freeze object-dtype ndarray args while the kernel runs
    (decorators.py:64 — the reference releases the GIL in C; freezing
    keeps concurrent mutation out either way)."""

    @functools.wraps(func)
    def wrapped(*args, **kwargs):
        frozen = [
            a for a in args
            if isinstance(a, np.ndarray) and a.dtype == object
        ]
        frozen += [
            v for k, v in kwargs.items()
            if k not in ("out", "where")
            and isinstance(v, np.ndarray) and v.dtype == object
        ]
        previous = [a.flags.writeable for a in frozen]
        try:
            for a in frozen:
                a.flags.writeable = False
            return func(*args, **kwargs)
        finally:
            for a, w in zip(frozen, previous):
                a.flags.writeable = w

    return wrapped


def deprecate_positional(should_be_kwargs, category=DeprecationWarning):
    """Warn when the listed parameters are passed positionally
    (decorators.py:97).  The message joins multiple names with an
    Oxford comma, singular/plural to match."""
    names = list(should_be_kwargs)

    def decorator(func):
        sig_names = inspect.unwrap(func).__code__.co_varnames[
            : inspect.unwrap(func).__code__.co_argcount
        ]
        positions = sorted(
            (sig_names.index(n), n) for n in names if n in sig_names
        )
        if not positions:
            return func
        first = positions[0][0]

        def message(n_args: int) -> str:
            hit = [n for i, n in positions if i < n_args]
            quoted = [f"`{n}`" for n in hit]
            if len(quoted) == 1:
                joined, s, verb = quoted[0], "", "is"
            elif len(quoted) == 2:
                joined, s, verb = " and ".join(quoted), "s", "are"
            else:
                joined = ", ".join(quoted[:-1]) + f", and {quoted[-1]}"
                s, verb = "s", "are"
            return (
                f"positional argument{s} {joined} for `{func.__name__}` "
                f"{verb} deprecated. Please use keyword argument{s} instead."
            )

        @functools.wraps(func)
        def wrapped(*args, **kwargs):
            result = func(*args, **kwargs)
            if len(args) > first:
                warnings.warn(
                    message(len(args)), category=category, stacklevel=2
                )
            return result

        return wrapped

    return decorator

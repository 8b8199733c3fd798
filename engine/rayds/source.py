"""Input source with Lance swap-in (SURVEY §7: "Lance table emulated as
Parquet behind a thin source that switches to lance when importable").

``read_table`` prefers ``ray.data.read_lance`` when the ``lance``
package exists (real deployments); this sandbox has no lance, so the
parquet path carries the identical schema.  Column projection is pushed
down in both cases (prune-at-the-read rule).
"""

from __future__ import annotations


def have_lance() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_table(path: str, columns=None, override_num_blocks=None):
    import ray.data

    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    if have_lance() and (path.endswith(".lance") or not path.endswith(".parquet")):
        return ray.data.read_lance(path, columns=columns, **kwargs)
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def image_table_dataset(path: str, with_payload: bool = False,
                        override_num_blocks=None):
    """Read a REAL input_hint table (image_id, bytes, w, h, fmt, caption,
    phash, x, y) — e.g. from engine/img/synth.py — projecting away the
    wide ``bytes`` column unless the caller needs it."""
    cols = None if with_payload else [
        "image_id", "x", "y", "w", "h", "fmt", "caption", "phash"
    ]
    return read_table(path, columns=cols, override_num_blocks=override_num_blocks)

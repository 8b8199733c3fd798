"""Per-worker-process broadcast cache.

``ray.put`` once on the driver; inside task-based ``map_batches`` fns,
``cached(ref, build)`` fetches the object at most once per worker
process (and runs the optional ``build`` step — index construction,
normalization — once too).  Gives prepared/stateful semantics with the
elasticity of the task pool and no actor-spawn cost; see
engine/rayds/stages.py for the rationale (fresh processes are expensive
in this sandbox, and pool sizing is a knob nobody sizes right)."""

from __future__ import annotations

from collections import OrderedDict

# small LRU: a long-lived worker serving many queries (each ray.put-ing
# its own layer/center ref) must not pin every past broadcast + built
# index for the process lifetime — keep the few most recent only
_CACHE: OrderedDict = OrderedDict()
_CACHE_MAX = 4


def cached(ref, build=None):
    """Return build(ray.get(ref)) (or the raw object), memoized per
    worker process keyed by (object ref, build fn) — LRU-bounded."""
    key = (ref.hex() if hasattr(ref, "hex") else id(ref),
           getattr(build, "__qualname__", None))
    hit = _CACHE.get(key)
    if hit is None:
        import ray

        obj = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        hit = build(obj) if build is not None else obj
        _CACHE[key] = hit
        while len(_CACHE) > _CACHE_MAX:
            _CACHE.popitem(last=False)
    else:
        _CACHE.move_to_end(key)
    return hit

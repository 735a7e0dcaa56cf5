"""Stage-execution helpers.

``cached_stage`` wraps a stateful stage class into a plain function for
``map_batches`` task mode: the instance is constructed once per worker
process and cached, giving actor-pool semantics (setup once, reuse across
batches) WITHOUT per-execution actor-pool spin-up. Ray reuses worker
processes across tasks, and broadcast ``ray.put`` objects resolve via the
local object store, so each worker pays the constructor exactly once per
pipeline.

Measured on this workload: the same zonal partial-stats stage runs ~8x
faster end-to-end as cached tasks than as an autoscaling actor pool (the
pool costs ~5 s of spin-up per execution at 32 CPUs). Use ``compute="actors"``
(map_batches concurrency with the class directly) only for state too
expensive to build once per worker process per pipeline — e.g. loading a
multi-GB model.
"""

from __future__ import annotations

import uuid

_STAGE_CACHE: dict[str, object] = {}
_CACHE_LIMIT = 8


def cached_stage(cls, *args, **kwargs):
    """Return a map_batches-compatible function that lazily constructs
    ``cls(*args, **kwargs)`` once per worker process."""
    key = f"{cls.__module__}.{cls.__qualname__}:{uuid.uuid4().hex}"

    def fn(batch):
        inst = _STAGE_CACHE.get(key)
        if inst is None:
            if len(_STAGE_CACHE) >= _CACHE_LIMIT:
                _STAGE_CACHE.pop(next(iter(_STAGE_CACHE)))
            inst = cls(*args, **kwargs)
            _STAGE_CACHE[key] = inst
        return inst(batch)

    fn.__name__ = f"cached_{cls.__name__}"
    return fn

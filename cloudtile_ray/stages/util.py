"""Small shared kernels for stages."""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import pyarrow as pa

# Per-worker-process instance cache for stateless-task stages: a stateless
# fn fuses with neighboring map stages (no actor-pool concurrency ceiling
# on the fused chain, no constructor args pinned in the object store —
# ray issue #53727), while the expensive setup (hash tables, planes,
# broadcast fetches) still happens at most once per worker process.
_WORKER_CACHE: dict[tuple, Any] = {}


def worker_cached(key: tuple, factory: Callable[[], Any]) -> Any:
    obj = _WORKER_CACHE.get(key)
    if obj is None:
        obj = factory()
        _WORKER_CACHE[key] = obj
    return obj


def stable_hash_strings(arr: pa.Array | np.ndarray | list) -> np.ndarray:
    """Deterministic 64-bit hash of a string/binary column, identical across
    processes and runs (pandas' keyed siphash — NOT Python ``hash``, which
    is salted per process and would break reproducibility-under-parallelism
    (SURVEY.md §7.5 hard part 3) and the md5-style resume skip)."""
    from pandas.util import hash_array

    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = arr.to_numpy(zero_copy_only=False)
    arr = np.asarray(arr, dtype=object)
    return hash_array(arr).astype(np.uint64)

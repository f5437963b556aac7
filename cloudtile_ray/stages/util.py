"""Small shared kernels for stages."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


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

"""Deterministic sampling / splitting stages for training-data curation.

Beyond-the-reference operators (the reference has no sampling of any
kind; its only row selection is tippecanoe's drop-rate ladder,
/root/reference/src/cloudtile/tippecanoe.yaml:56-63): corpus curation
needs reproducible subsampling (per-language rebalancing) and
train/validation splits that are stable across reruns and cluster sizes.

Every function here is a pure ``map_batches`` filter keyed on an integer
id hashed with SQL-reproducible arithmetic (multiply by a prime, modulo a
small bucket count — all in int64, no overflow for |id| < 2^63/7919), so
each operator has an exact DuckDB oracle and the sample is a pure
function of the row, independent of partitioning, block order or
parallelism — the property that makes a 100-TB resume produce the same
sample as a fresh run.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

BUCKETS = 10_000
_PRIME = 7919


def _bucket(ids: np.ndarray) -> np.ndarray:
    """SQL-replayable bucket in [0, BUCKETS): ``(id * 7919) % 10000``.
    Stays inside int64 for any id below 2^63/7919 (~1.16e15 — far above
    a 10^12-doc corpus)."""
    return (ids.astype(np.int64) * _PRIME) % BUCKETS


def hash_stratified_sample(ds, rates: dict[str, float], group_col: str = "lang",
                           id_col: str = "doc_id"):
    """Keep each row with probability ``rates[group]`` (default-group rate
    under key ``"*"``, else 1.0), decided by the row's own id bucket —
    deterministic, partition-independent, zero-shuffle.  Rates are
    quantized to 1/BUCKETS resolution."""
    cuts = {g: int(round(r * BUCKETS)) for g, r in rates.items()}
    default = cuts.get("*", BUCKETS)

    def keep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        b = _bucket(batch.column(id_col).to_numpy())
        groups = batch.column(group_col).to_numpy(zero_copy_only=False)
        cut = np.array([cuts.get(g, default) for g in np.atleast_1d(groups)])
        return batch.take(pa.array(np.nonzero(b < cut)[0]))

    return ds.map_batches(keep, batch_format="pyarrow")


def hash_split(ds, val_frac: float = 0.1, id_col: str = "doc_id",
               col: str = "split"):
    """Append a ``split`` column ('train' / 'val') from the same id
    bucket — a reproducible train/validation split that never moves a
    document between splits when the corpus is re-sharded or resumed."""
    cut = int(round(val_frac * BUCKETS))

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(col, pa.array([], pa.string()))
        b = _bucket(batch.column(id_col).to_numpy())
        return batch.append_column(
            col, pa.array(np.where(b < cut, "val", "train"))
        )

    return ds.map_batches(tag, batch_format="pyarrow")


def epoch_resample(ds, epochs: dict[str, float], group_col: str = "source",
                   id_col: str = "doc_id", copy_col: str = "copy"):
    """Epoch-weighted source mixing: emit each row ``floor(w)`` times
    plus one more for the id-hash fraction of rows selected by the
    fractional part of ``w``, where ``w = epochs[group]`` (default under
    ``"*"``, else 1.0).

    This is the standard training-mixture op ("2.5 epochs of wiki, 0.25
    of web") expressed as a pure, zero-shuffle ``map_batches`` expansion:
    the copy count is a function of the row alone (same id-hash bucket
    arithmetic as :func:`hash_stratified_sample`), so the mixture is
    identical across reruns, resumes and cluster widths, and it has an
    exact DuckDB oracle (``generate_series(1, n)``).  A ``copy_col``
    (1..n) disambiguates the emitted duplicates downstream (e.g. for a
    deterministic global shuffle key of (id, copy)).

    Scale note: expansion happens batch-side AFTER any column pruning the
    caller applied, and blocks grow by at most ``max(epochs) + 1``x —
    size ``batch_size`` upstream accordingly for large multipliers."""
    floors = {g: int(np.floor(w)) for g, w in epochs.items()}
    fracs = {g: int(round((w - np.floor(w)) * BUCKETS)) for g, w in epochs.items()}
    default_w = epochs.get("*", 1.0)
    dfl, dfr = int(np.floor(default_w)), int(round((default_w - np.floor(default_w)) * BUCKETS))

    def expand(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(copy_col, pa.array([], pa.int64()))
        b = _bucket(batch.column(id_col).to_numpy())
        groups = batch.column(group_col).to_numpy(zero_copy_only=False)
        base = np.array([floors.get(g, dfl) for g in np.atleast_1d(groups)])
        cut = np.array([fracs.get(g, dfr) for g in np.atleast_1d(groups)])
        n = base + (b < cut)
        idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), n)
        starts = np.concatenate([[0], np.cumsum(n)])[:-1]
        copy = np.arange(len(idx), dtype=np.int64) - starts[np.repeat(
            np.arange(batch.num_rows), n)] + 1
        out = batch.take(pa.array(idx))
        return out.append_column(copy_col, pa.array(copy, pa.int64()))

    return ds.map_batches(expand, batch_format="pyarrow")

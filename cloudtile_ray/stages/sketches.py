"""Mergeable sketch operators — the approximate scale path next to the
engine's exact aggregates.

HyperLogLog (Flajolet/Fusy/Gandouet/Meunier 2007, public construction)
estimates per-group COUNT DISTINCT in O(2^p) space per group where the
exact operator (:func:`cloudtile_ray.stages.relational.grouped_distinct_count`)
must ship every distinct (group, value) pair through the exchange.  At
100 TB the exact pair table for a near-unique value column is the corpus
itself; the sketch is 4 KiB per group regardless of cardinality.

Scale shape — everything rides the engine's standard exchanges, nothing
bespoke: a register is a ROW ``(group, bucket, rho)``, so the global
register merge is ``bucketed_group_aggregate(..., max(rho))`` (registers
for one (group, bucket) always meet in one bucket task), and the
harmonic-sum reduction over each group's <= 2^p registers is a second
exchange with decomposable sums.  Hashing is the repo-wide deterministic
siphash (`stable_hash_strings` / pandas hash_array), so estimates are
bit-reproducible at any parallelism — tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _hash64(col: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """Deterministic uint64 hash of any scalar column (same keyed siphash
    the dedup/bucket exchanges use — process-stable, run-stable)."""
    from pandas.util import hash_array

    arr = col.to_numpy(zero_copy_only=False)
    return hash_array(np.asarray(arr, dtype=object)).astype(np.uint64)


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 values < 2**53 (exact as float64)."""
    out = np.zeros(len(w), dtype=np.int64)
    nz = w > 0
    out[nz] = np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64) + 1
    return out


def dd_quantiles(
    ds,
    group_col: str,
    val_col: str,
    qs=(0.5, 0.95, 0.99),
    alpha: float = 0.01,
):
    """Approximate per-group quantiles with a RELATIVE-error guarantee via
    a log-bucket histogram (the DDSketch construction — Masson/Rim/Lee,
    VLDB 2019, public): bucket(x) = ceil(log_gamma(x)) with
    gamma = (1+alpha)/(1-alpha), so any returned quantile is within
    alpha of the true value multiplicatively.

    The scale story mirrors :func:`hll_distinct`: a bucket is a ROW
    ``(group, bucket, count)``, the global merge is the standard count
    exchange (decomposable sums), and per-group quantile extraction runs
    over the group's O(log_gamma(max/min)) bucket rows in one task —
    ~2.3k buckets span [1, 10^10] at alpha=0.01, regardless of row
    count.  The exact operator (`quantiles.exact_quantiles`) ships every
    distinct value; this ships a bounded histogram — the 100 TB path.

    Non-positive values: x <= 0 lands in bucket MIN_BUCKET (reported as
    0.0) — callers with signed data should sketch the two signs
    separately.  Deterministic by construction (integer bucketing, no
    hashing), so results are identical at any parallelism."""
    import pyarrow.compute as pc

    from cloudtile_ray.stages.relational import bucketed_group_aggregate

    if not 0 < alpha < 0.3:
        raise ValueError("alpha must be in (0, 0.3)")
    gamma = (1.0 + alpha) / (1.0 - alpha)
    lg = np.log(gamma)
    MIN_BUCKET = np.int64(-(2**31))

    def bucketize(t: pa.Table) -> pa.Table:
        x = t.column(val_col).to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.full(len(x), MIN_BUCKET, dtype=np.int64)
        pos = x > 0
        b[pos] = np.ceil(np.log(x[pos]) / lg).astype(np.int64)
        part = pa.table(
            {
                group_col: t.column(group_col),
                "_qb": pa.array(b),
                "_one": pa.array(np.ones(len(x), dtype=np.int64)),
            }
        )
        agg = part.group_by([group_col, "_qb"]).aggregate([("_one", "sum")])
        return agg.rename_columns([group_col, "_qb", "n"])

    hist = bucketed_group_aggregate(
        ds.map_batches(bucketize, batch_format="pyarrow"),
        [group_col, "_qb"],
        [("n", "sum", "n")],
    )

    qs = tuple(float(q) for q in qs)

    def extract(g: "pa.Table") -> "pa.Table":
        import pandas as pd

        df = g.to_pandas().sort_values("_qb")
        out_rows = {group_col: [], "q": [], "value": []}
        for key, sub in df.groupby(group_col, sort=True):
            counts = sub["n"].to_numpy()
            buckets = sub["_qb"].to_numpy()
            cum = np.cumsum(counts)
            total = cum[-1]
            for q in qs:
                rank = max(1, int(np.ceil(q * total)))
                i = int(np.searchsorted(cum, rank))
                b = buckets[i]
                # bucket (gamma^(b-1), gamma^b] -> midpoint estimate
                v = 0.0 if b == MIN_BUCKET else 2.0 * gamma**b / (gamma + 1.0)
                out_rows[group_col].append(key)
                out_rows["q"].append(q)
                out_rows["value"].append(v)
        return pa.table(
            {
                group_col: pa.array(out_rows[group_col]),
                "q": pa.array(out_rows["q"], pa.float64()),
                "value": pa.array(out_rows["value"], pa.float64()),
            }
        )

    # per-group histograms are O(log range) rows: group them in one pass
    return hist.groupby(group_col).map_groups(extract, batch_format="pyarrow")


def _bloom_indices(h: np.ndarray, k: int, num_bits: int) -> np.ndarray:
    """(len(h), k) probe positions via double hashing — h1 + i*h2 mod m
    (Kirsch-Mitzenmacher construction, public)."""
    h1 = h
    h2 = (h * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)  # odd => full cycle
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(num_bits)).astype(
        np.int64
    )


def bloom_build(ds, col: str, num_bits: int, k: int = 7) -> np.ndarray:
    """Build a Bloom filter over a key column; returns the bit array
    (uint8, num_bits/8 bytes) for ``ray.put`` + broadcast into
    :func:`bloom_prefilter`.

    Scale shape: each block reduces to ONE row carrying its local bloom
    bytes; the driver ORs block-count rows (driver traffic =
    blocks x num_bits/8 — e.g. 1k blocks x 1 MiB = 1 GiB worst case;
    size num_bits to the KEY set, which is small by the broadcast-side
    contract of this op, exactly like every broadcast join here).  With
    ~10 bits/key and k=7 the false-positive rate is <1%; FPs only cost
    extra rows in the exact verify stage, never wrong results."""
    if num_bits % 8:
        raise ValueError("num_bits must be a multiple of 8")

    def local_bloom(t: pa.Table) -> pa.Table:
        bits = np.zeros(num_bits // 8, dtype=np.uint8)
        if t.num_rows:
            idx = _bloom_indices(_hash64(t.column(col)), k, num_bits).ravel()
            np.bitwise_or.at(bits, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8))
        return pa.table({"bloom": pa.array([bits.tobytes()], pa.binary())})

    parts = ds.map_batches(
        local_bloom, batch_format="pyarrow", batch_size=None
    ).take_all()
    out = np.zeros(num_bits // 8, dtype=np.uint8)
    for r in parts:
        out |= np.frombuffer(r["bloom"], dtype=np.uint8)
    return out


def bloom_prefilter(batch: pa.Table, col: str, bits: np.ndarray, k: int = 7) -> pa.Table:
    """Keep only rows whose key MIGHT be in the bloom (no false
    negatives) — the broadcast prefilter that shrinks a big probe side
    before an exact join, instead of shuffling the whole fact table."""
    if batch.num_rows == 0:
        return batch
    num_bits = len(bits) * 8
    idx = _bloom_indices(_hash64(batch.column(col)), k, num_bits)
    hit = (bits[idx >> 3] & (np.uint8(1) << (idx & 7).astype(np.uint8))) != 0
    return batch.filter(pa.array(hit.all(axis=1)))


def hll_partials(batch: pa.Table, group_col: str, value_col: str, p: int) -> pa.Table:
    """Batch-side HLL register partials: one row per (group, bucket) seen
    in the batch with the max rho.  p >= 11 keeps the rank word < 2**53
    so the float64 log2 path is exact."""
    if not 11 <= p <= 18:
        raise ValueError("p must be in [11, 18]")
    h = _hash64(batch.column(value_col))
    m = np.uint64(1) << np.uint64(p)
    bucket = (h & (m - np.uint64(1))).astype(np.int64)
    w = h >> np.uint64(p)  # top 64-p bits as the rank word
    rho = (64 - p) - _bit_length_u64(w) + 1  # leading zeros + 1
    t = pa.table(
        {
            group_col: batch.column(group_col),
            "_hllb": pa.array(bucket),
            "_rho": pa.array(rho),
        }
    )
    # batch-side combine: max rho per (group, bucket)
    part = t.group_by([group_col, "_hllb"]).aggregate([("_rho", "max")])
    return part.rename_columns([group_col, "_hllb", "_rho"])


def hll_registers_exact(
    ds,
    group_col: str,
    value_col: str,
    p: int = 12,
    mult: int = 0x9E3779B97F4A7C15,
):
    """EXACT per-group HyperLogLog register state -> Dataset
    (group, hllb, rho): one row per non-empty register with the max rho
    observed.  The kmv_distinct certifiability pattern applied to HLL
    (r4 verdict item 4): registers are pure int64 max-aggregates over a
    SQL-replayable hash — ``h = (value * mult) mod 2**64`` (Knuth
    multiplicative; numpy uint64 multiply wraps exactly like DuckDB
    ``(HUGEINT * ) % 2**64``), bucket = low ``p`` bits, rank word = the
    remaining 64-p bits, ``rho = (64-p) - bit_length(w) + 1`` with the
    bit length replayed via ``length(bin(w))`` — so a DuckDB oracle
    reproduces every row bit-for-bit and the driver hash-certifies the
    sketch state itself (the float estimate is one documented map over
    these rows; see :func:`hll_distinct` for the estimator).  Note the
    low-bit bucket of a multiplicative hash is a bijection mod 2**p for
    odd ``mult`` — uniform on integer keys — while the rank word rides
    the well-mixed high bits.

    Scale shape: identical to :func:`hll_distinct`'s register build —
    batch-side (group, bucket) max partials, one bucket exchange,
    <= groups x 2**p rows ever ship."""
    if not 11 <= p <= 18:
        raise ValueError("p must be in [11, 18]")
    if mult % 2 == 0:
        raise ValueError("mult must be odd (low-bit bucket bijection)")

    from cloudtile_ray.stages.relational import bucketed_group_aggregate

    m = np.uint64(1) << np.uint64(p)

    def partial(batch: pa.Table) -> pa.Table:
        x = (
            batch.column(value_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        if (x < 0).any():
            raise ValueError("hll_registers_exact requires non-negative keys")
        h = x.astype(np.uint64) * np.uint64(mult)  # wraps mod 2**64
        bucket = (h & (m - np.uint64(1))).astype(np.int64)
        w = h >> np.uint64(p)
        rho = (64 - p) - _bit_length_u64(w) + 1
        t = pa.table(
            {
                group_col: batch.column(group_col),
                "hllb": pa.array(bucket),
                "rho": pa.array(rho),
            }
        )
        part = t.group_by([group_col, "hllb"]).aggregate([("rho", "max")])
        return part.rename_columns([group_col, "hllb", "rho"])

    return bucketed_group_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col, "hllb"],
        [("rho", "max", "rho")],
    )


def hll_distinct(
    ds,
    group_col: str,
    value_col: str,
    p: int = 12,
    out_name: str = "approx_distinct",
):
    """Approximate per-group COUNT(DISTINCT value) via HyperLogLog.

    Relative standard error ~= 1.04 / sqrt(2**p) (1.6% at p=12).  Exact
    reproducibility under parallelism holds (deterministic hash; max and
    integer sums are order-free; the final float harmonic sum runs over
    one group's register rows inside a single task).
    """
    import pyarrow.compute as pc

    from cloudtile_ray.stages.relational import bucketed_group_aggregate

    m = 1 << p
    if m >= 128:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673

    regs = bucketed_group_aggregate(
        ds.map_batches(
            lambda t: hll_partials(t, group_col, value_col, p),
            batch_format="pyarrow",
        ),
        [group_col, "_hllb"],
        [("_rho", "max", "_rho")],
    )

    def weight(t: pa.Table) -> pa.Table:
        rho = t.column("_rho").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                group_col: t.column(group_col),
                "_w": pa.array(np.ldexp(1.0, -rho)),  # 2**-rho exact
                "_one": pa.array(np.ones(len(rho), dtype=np.int64)),
            }
        )

    sums = bucketed_group_aggregate(
        regs.map_batches(weight, batch_format="pyarrow"),
        [group_col],
        [("_w", "sum", "_sw"), ("_one", "sum", "_nreg")],
    )

    def estimate(t: pa.Table) -> pa.Table:
        sw = t.column("_sw").to_numpy(zero_copy_only=False)
        nreg = t.column("_nreg").to_numpy(zero_copy_only=False)
        zeros = m - nreg  # absent registers have rho 0 -> weight 2**0 = 1
        e = alpha * m * m / (sw + zeros)
        # small-range (linear counting) correction, per the paper
        small = (e <= 2.5 * m) & (zeros > 0)
        with np.errstate(divide="ignore"):
            lc = m * np.log(m / np.maximum(zeros, 1))
        est = np.where(small, lc, e)
        return pa.table(
            {
                group_col: t.column(group_col),
                out_name: pa.array(np.rint(est).astype(np.int64)),
            }
        )

    return sums.map_batches(estimate, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005, public construction)
# ---------------------------------------------------------------------------


def _cms_cells(h: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(len(h), depth) int64 cell ids: row d uses the double-hashing family
    h1 + d*h2 (same construction as :func:`_bloom_indices`), flattened to
    row-major (d * width + col)."""
    h1 = h
    h2 = (h >> np.uint64(17)) | np.uint64(1)  # odd => full-period stride
    d = np.arange(depth, dtype=np.uint64)
    cells = (h1[:, None] + d[None, :] * h2[:, None]) % np.uint64(width)
    return (d[None, :] * np.uint64(width) + cells).astype(np.int64)


def cms_build(ds, key_col: str, weight_col: str | None, depth: int, width: int):
    """Count-Min frequency sketch of ``key_col`` (weighted by
    ``weight_col`` when given): ``depth × width`` int64 counters in
    O(depth·width) space regardless of key cardinality — the approximate
    scale path next to the exact heavy-hitter exchange
    (:func:`cloudtile_ray.stages.text.heavy_hitters`'s count table is
    vocabulary-sized; the sketch is fixed-size and its point estimate
    overcounts by at most ~2N/width with probability 1 - 2^-depth).

    Scale shape mirrors :func:`bloom_build`: each batch folds its keys
    into ONE local (depth·width) counter array (np.add.at — vectorized
    scatter-add), emitted as a single binary row; the driver sums the
    per-block partials (sketch merge IS element-wise addition, the
    mergeability that makes CMS distributed-safe).  Hashing is the
    repo-wide deterministic hash, so the sketch is bit-reproducible at
    any parallelism.  Returns the (depth, width) int64 counter matrix."""
    size = depth * width

    def partial(batch: pa.Table) -> pa.Table:
        counters = np.zeros(size, dtype=np.int64)
        if batch.num_rows:
            h = _hash64(batch.column(key_col))
            cells = _cms_cells(h, depth, width)
            if weight_col is None:
                w = np.ones(len(h), dtype=np.int64)
            else:
                w = batch.column(weight_col).to_numpy(zero_copy_only=False).astype(
                    np.int64
                )
            np.add.at(counters, cells.ravel(), np.repeat(w, depth))
        return pa.table({"sketch": pa.array([counters.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    total = np.zeros(size, dtype=np.int64)
    for row in parts:
        total += np.frombuffer(row["sketch"], dtype=np.int64)
    return total.reshape(depth, width)


_CMS_EXACT_MULTS = (
    0x9E3779B97F4A7C15,  # golden-ratio Knuth constants, all odd
    0xC2B2AE3D27D4EB4F,
    0x165667B19E3779F9,
    0x27D4EB2F165667C5,
)


def cms_registers_exact(
    ds,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
    mults: tuple = _CMS_EXACT_MULTS,
):
    """EXACT Count-Min counter state -> Dataset (row, cell, n): one row
    per non-zero counter of the depth x width sketch — the kmv/HLL
    certifiability pattern applied to CMS.  Row ``j`` hashes the
    non-negative int64 key as ``cell = ((x * mults[j]) mod 2**64) >>
    (64 - log2(width))`` — the HIGH bits of a Knuth multiply (the low
    bits of ``x * odd_mult`` depend only on ``x mod width``, which
    would make all depth rows collide identically; the Fibonacci-
    hashing high bits mix the whole key and differ per row).  numpy
    uint64 multiply wraps exactly like DuckDB ``(HUGEINT *) % 2**64``
    and the shift is ``h // 2**(64-lg)``, so the full counter table
    replays bit-for-bit in SQL; every counter is a pure integer SUM —
    order-free — and the point estimate (min over rows,
    :func:`cms_query` semantics) is one documented map over these
    certified rows.

    Scale shape: batch-side (row, cell) count partials (one
    ``group_by`` per batch over <= depth x width cells), ONE bucket
    exchange, <= depth x width rows ever ship — same envelope as
    :func:`cms_build` with rows instead of a packed binary blob."""
    if depth > len(mults):
        raise ValueError(f"depth must be <= {len(mults)}")
    lg = int(width).bit_length() - 1
    if width < 2 or (1 << lg) != width:
        raise ValueError("width must be a power of two >= 2")
    shift = np.uint64(64 - lg)
    from cloudtile_ray.stages.relational import bucketed_group_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        x = (
            batch.column(value_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        if (x < 0).any():
            raise ValueError("cms_registers_exact requires non-negative keys")
        xs = x.astype(np.uint64)
        rows_out = []
        for j in range(depth):
            cells = ((xs * np.uint64(mults[j])) >> shift).astype(np.int64)
            cu, cn = np.unique(cells, return_counts=True)
            rows_out.append(
                pa.table(
                    {
                        "row": pa.array(
                            np.full(len(cu), j, dtype=np.int64)
                        ),
                        "cell": pa.array(cu),
                        "n": pa.array(cn.astype(np.int64)),
                    }
                )
            )
        return pa.concat_tables(rows_out)

    return bucketed_group_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["row", "cell"],
        [("n", "sum", "n")],
    )


def cms_query(sketch: np.ndarray, keys: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """Point-estimate counts for ``keys``: min over the depth rows of each
    key's cells (the CMS estimate — always >= the true count)."""
    depth, width = sketch.shape
    h = _hash64(keys)
    cells = _cms_cells(h, depth, width)
    return sketch.ravel()[cells].min(axis=1)


def kmv_sketch(ds, col: str, k: int = 64, mult: int = 2654435761, mod: int = 1 << 32):
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002)
    with an EXACTLY replayable hash: ``h = (x * mult) % mod`` on the
    non-negative int64 key — plain modular arithmetic, so a SQL oracle
    reproduces the estimate to the bit (unlike the HLL family's
    bit-twiddled hashes, this sketch is certifiable end-to-end).

    Scale shape: each batch keeps its k smallest DISTINCT hashes (an
    ``np.unique`` + ``partition`` over batch rows — the only full-data
    pass); partials are <= k rows per block, deduped through one tiny
    bucket exchange, and the global k-th minimum is a sort+limit over
    <= k * n_blocks rows.  Estimate = (k-1) * mod / h_k (one double
    multiply then one divide — fixed order, oracle-identical).  Returns
    a 1-row Dataset (k, kth_hash, est_distinct)."""
    import pyarrow.compute as pc
    import ray.data

    from cloudtile_ray.stages.relational import bucketed_group_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        if (x < 0).any():
            raise ValueError("kmv_sketch requires non-negative keys")
        # keys above 2^63 // mult would wrap int64 in x * mult while a
        # SQL oracle promotes to HUGEINT — reject them so the
        # bit-exact-replay contract holds on the full accepted domain
        if (x >= (1 << 63) // mult).any():
            raise ValueError(
                f"kmv_sketch keys must be < 2**63 // mult ({(1 << 63) // mult})"
            )
        hv = (x * np.int64(mult)) % np.int64(mod)
        u = np.unique(hv)
        return pa.table({"hv": pa.array(u[:k])})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    distinct = bucketed_group_aggregate(
        partials, ["hv"], [("hv", "min", "_one")]
    ).map_batches(lambda t: t.select(["hv"]), batch_format="pyarrow")
    smallest = distinct.sort("hv").limit(k).take_all()
    hs = sorted(r["hv"] for r in smallest)
    if not hs:
        kth, est = 0, 0.0
    else:
        kth = hs[-1]
        est = (k - 1) * float(mod) / kth if len(hs) == k else float(len(hs))
    return ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([k], pa.int64()),
                "kth_hash": pa.array([kth], pa.int64()),
                "est_distinct": pa.array([est], pa.float64()),
            }
        )
    )


BLOOM_MULTS = (
    0x9E3779B97F4A7C15,
    0xC2B2AE3D27D4EB4F,
    0x165667B19E3779F9,
    0x27D4EB2F165667C5,
)


def bloom_registers_exact(
    ds, value_col: str, m_log2: int = 12, mults: tuple = BLOOM_MULTS
) -> "ray.data.Dataset":
    """EXACT COUNTING-Bloom-filter register state -> one row per
    non-zero cell ``(j, bit, n)``: hash function index, cell index
    (top ``m_log2`` bits of the Knuth multiplicative hash ``(x *
    mult_j) mod 2**64``), and the exact number of input ROWS landing
    there.  The kmv/hll/cms certifiability pattern applied to the
    Bloom family — every cell is an integer sum under a
    HUGEINT-replayable hash, so the driver hash-certifies the filter
    STATE itself; membership testing (``bloom_semi``) stays the
    documented approximate use.  Counts are decomposable sums:
    batch-side partials pre-fold before one cell-sized exchange
    (<= k x 2**m_log2 rows ever ship, independent of input size)."""
    if not 8 <= m_log2 <= 24:
        raise ValueError("m_log2 must be in [8, 24]")
    for m in mults:
        if m % 2 == 0:
            raise ValueError("multipliers must be odd")

    from cloudtile_ray.stages.relational import bucketed_group_aggregate

    shift = np.uint64(64 - m_log2)

    def partial(batch: pa.Table) -> pa.Table:
        x = (
            batch.column(value_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        if (x < 0).any():
            raise ValueError("bloom_registers_exact requires non-negative keys")
        js, bits, ns = [], [], []
        for j, m in enumerate(mults):
            h = (x.astype(np.uint64) * np.uint64(m)) >> shift
            b, c = np.unique(h.astype(np.int64), return_counts=True)
            js.append(np.full(len(b), j, dtype=np.int64))
            bits.append(b)
            ns.append(c.astype(np.int64))
        return pa.table(
            {
                "j": pa.array(np.concatenate(js) if js else np.array([], np.int64)),
                "bit": pa.array(np.concatenate(bits) if bits else np.array([], np.int64)),
                "n": pa.array(np.concatenate(ns) if ns else np.array([], np.int64)),
            }
        )

    cells = ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_group_aggregate(cells, ["j", "bit"], [("n", "sum", "n")])


def bloom_fp_audit(
    ds,
    value_col: str,
    member_mask_col: str,
    m_log2: int = 10,
    mults: tuple = BLOOM_MULTS,
) -> "ray.data.Dataset":
    """Bloom-filter FALSE-POSITIVE audit, end to end certifiable: build
    a k-hash Bloom filter over the MEMBER keys (rows where
    ``member_mask_col`` is true), test EVERY row's key against it, and
    report ``(n_tested, n_pass, n_true, n_fp)`` — the measured FP cost
    a bloom-semi-join plan pays at this m/k, vs the exact membership
    truth.  Blooms have no false negatives, so ``n_fp = n_pass -
    n_true`` and the audit certifies that identity too.

    Scale shape: the BIT SET is the only global state — unions of
    per-batch (j, bit) partials (<= k * 2**m rows, input-independent),
    gathered and broadcast; keys never assemble.  Exact truth takes
    the byte-gated path: the distinct member-key set broadcasts under
    the budget (measured bytes), else membership is counted with the
    hash-partitioned semi join — the same gate idiom as the engine's
    other small-side lookups."""
    import pyarrow.compute as pc
    import ray
    import ray.data

    from cloudtile_ray.stages.relational import bucketed_group_aggregate, hash_join

    if not 8 <= m_log2 <= 24:
        raise ValueError("m_log2 must be in [8, 24]")
    shift = np.uint64(64 - m_log2)
    k = len(mults)

    members = ds.map_batches(
        lambda t: t.filter(
            pc.equal(t.column(member_mask_col), True)
        ).select([value_col]),
        batch_format="pyarrow",
    )

    # distinct member keys once; feeds BOTH the bit set and the truth
    distinct_members = bucketed_group_aggregate(
        members, [value_col], [(value_col, "min", "_one")]
    ).map_batches(
        lambda t: t.select([value_col]), batch_format="pyarrow"
    ).materialize()

    def bits_partial(t: pa.Table) -> pa.Table:
        x = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if (x < 0).any():
            raise ValueError("bloom_fp_audit requires non-negative keys")
        js, bs = [], []
        for j, m in enumerate(mults):
            h = (x.astype(np.uint64) * np.uint64(m)) >> shift
            u = np.unique(h).astype(np.int64)
            js.append(np.full(len(u), j, dtype=np.int64))
            bs.append(u)
        return pa.table(
            {
                "j": pa.array(np.concatenate(js) if js else np.array([], np.int64)),
                "bit": pa.array(np.concatenate(bs) if bs else np.array([], np.int64)),
            }
        )

    bit_rows = bucketed_group_aggregate(
        distinct_members.map_batches(bits_partial, batch_format="pyarrow"),
        ["j", "bit"],
        [("j", "min", "_one")],
    ).materialize()
    btabs = [
        t for t in ray.get(list(bit_rows.to_arrow_refs())) if t.num_columns
    ]
    bitset = np.zeros((k, 1 << m_log2), dtype=bool)
    if btabs:
        bt = pa.concat_tables(btabs)
        bitset[
            bt.column("j").to_numpy(zero_copy_only=False),
            bt.column("bit").to_numpy(zero_copy_only=False),
        ] = True
    bref = ray.put(bitset)

    # truth path: byte-gated broadcast of the distinct member keys
    gate = 256 << 20
    member_bytes = distinct_members.size_bytes() or 0
    kref = None
    if member_bytes <= gate:
        ktabs = [
            t
            for t in ray.get(list(distinct_members.to_arrow_refs()))
            if t.num_columns
        ]
        keys = (
            pa.concat_tables(ktabs).column(value_col).combine_chunks()
            if ktabs
            else pa.array([], pa.int64())
        )
        kref = ray.put(keys)

    def audit(t: pa.Table) -> pa.Table:
        x = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        bs = ray.get(bref)
        ok = np.ones(len(x), dtype=bool)
        for j, m in enumerate(mults):
            h = (x.astype(np.uint64) * np.uint64(m)) >> shift
            ok &= bs[j, h.astype(np.int64)]
        row = {
            "n_tested": np.int64(len(x)),
            "n_pass": np.int64(int(ok.sum())),
        }
        if kref is not None:
            idx = pc.index_in(
                pa.array(x), value_set=ray.get(kref)
            )
            row["n_true"] = np.int64(
                int(pc.sum(pc.is_valid(idx).cast(pa.int64())).as_py() or 0)
            )
        return pa.table({c: pa.array([v]) for c, v in row.items()})

    sums = ds.map_batches(audit, batch_format="pyarrow").sum(
        ["n_tested", "n_pass"] + (["n_true"] if kref is not None else [])
    )
    n_tested = int(sums["sum(n_tested)"])
    n_pass = int(sums["sum(n_pass)"])
    if kref is not None:
        n_true = int(sums["sum(n_true)"])
    else:
        # web-scale member set: hash-partitioned semi join for the truth
        n_true = hash_join(
            ds.map_batches(
                lambda t: t.select([value_col]), batch_format="pyarrow"
            ),
            distinct_members,
            on=(value_col,),
            how="semi",
        ).count()
    return ray.data.from_arrow(
        pa.table(
            {
                "n_tested": pa.array([n_tested], pa.int64()),
                "n_pass": pa.array([n_pass], pa.int64()),
                "n_true": pa.array([n_true], pa.int64()),
                "n_fp": pa.array([n_pass - n_true], pa.int64()),
            }
        )
    )

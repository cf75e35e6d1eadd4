"""Profile aggregation (SURVEY.md B6): per-(partition, column) stats —
null counts, min/max/mean, HLL distinct, t-digest quantiles — computed
as partial sketches per batch and merged in a tiny groupby, so the
all-to-all exchange moves one sketch row per (block × column), never
the data.

Two surfaces:

- ``HllDistinct`` / ``TDigestQuantile`` — ``AggregateFnV2`` subclasses
  usable directly in ``ds.aggregate(...)`` / ``groupby().aggregate(...)``
  (accumulators are serialized sketch bytes; combine = sketch merge —
  commutative + associative, so results are parallelism-invariant).
- ``profile(ds, columns, ...)`` — the engine's profile operator:
  map_batches partials → groupby(partition_id, column) merge →
  one profile row per (partition, column).

Exact twins (§5.3): ``mode="exact"`` computes n_distinct via a real
distinct shuffle; exact quantiles come from ``exact_quantiles`` /
``exact_quantiles_grouped`` (histogram-narrowing selection, below) —
used by DuckDB-oracle queries; sketch mode is for scale. Never
oracle-compare a sketch.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import AggregateFnV2
from ray.data.block import Block, BlockAccessor

from .sketches import HLL, TDigest, hash64_values

__all__ = ["HllDistinct", "TDigestQuantile", "profile", "PROFILE_SCHEMA", "exact_quantiles", "exact_quantiles_grouped"]


def _arrow_col(block: Block, name: str) -> pa.ChunkedArray:
    acc = BlockAccessor.for_block(block)
    return acc.to_arrow()[name]


class HllDistinct(AggregateFnV2):
    """Approximate COUNT(DISTINCT col) via HyperLogLog (p=14, ~1.3%).

    Accumulator = serialized register array (bytes), so it flows
    through Ray's aggregate machinery like any other value."""

    def __init__(self, on: str, alias_name: Optional[str] = None, p: int = 14):
        self._p = p
        super().__init__(
            alias_name if alias_name else f"hll_distinct({on})",
            on=on,
            ignore_nulls=True,
            zero_factory=lambda: HLL(p).serialize(),
        )

    def aggregate_block(self, block: Block):
        col = _arrow_col(block, self._target_col_name)
        col = col.drop_null()
        if len(col) == 0:
            return HLL(self._p).serialize()
        vals = col.to_numpy(zero_copy_only=False)
        return HLL(self._p).update_hashes(hash64_values(vals)).serialize()

    def combine(self, a: bytes, b: bytes) -> bytes:
        return HLL.deserialize(a).merge(HLL.deserialize(b)).serialize()

    def finalize(self, acc: bytes) -> int:
        return int(round(HLL.deserialize(acc).estimate()))


class TDigestQuantile(AggregateFnV2):
    """Approximate quantile via merging t-digest (δ=200)."""

    def __init__(
        self,
        on: str,
        q: float = 0.5,
        alias_name: Optional[str] = None,
        compression: float = 200.0,
    ):
        self._q = q
        self._compression = compression
        super().__init__(
            alias_name if alias_name else f"tdigest_q{q}({on})",
            on=on,
            ignore_nulls=True,
            zero_factory=lambda: TDigest(compression).serialize(),
        )

    def aggregate_block(self, block: Block):
        col = _arrow_col(block, self._target_col_name).drop_null()
        td = TDigest(self._compression)
        if len(col):
            td.update(col.to_numpy(zero_copy_only=False).astype(np.float64))
        return td.serialize()

    def combine(self, a: bytes, b: bytes) -> bytes:
        return TDigest.deserialize(a).merge(TDigest.deserialize(b)).serialize()

    def finalize(self, acc: bytes) -> float:
        return TDigest.deserialize(acc).quantile(self._q)


# ---------------------------------------------------------------------------
# profile operator
# ---------------------------------------------------------------------------

PROFILE_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("column", pa.string()),
        ("n", pa.int64()),
        ("n_null", pa.int64()),
        ("n_distinct", pa.int64()),
        ("min", pa.float64()),
        ("max", pa.float64()),
        ("mean", pa.float64()),
        ("p50", pa.float64()),
        ("p90", pa.float64()),
        ("p99", pa.float64()),
        ("tdigest", pa.binary()),
        ("hll", pa.binary()),
    ]
)

_PARTIAL_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("column", pa.string()),
        ("n", pa.int64()),
        ("n_null", pa.int64()),
        ("min", pa.float64()),
        ("max", pa.float64()),
        ("sum", pa.float64()),
        ("tdigest", pa.binary()),
        ("hll", pa.binary()),
    ]
)


def _numeric_view(col: pa.ChunkedArray) -> np.ndarray | None:
    """Float view of a column for stats: numeric → values; string/binary
    → utf8 length; list → list length; timestamp → epoch micros."""
    t = col.type
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        return col.to_numpy(zero_copy_only=False).astype(np.float64)
    if pa.types.is_boolean(t):
        return col.cast(pa.int8()).to_numpy(zero_copy_only=False).astype(np.float64)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.float64)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return pc.binary_length(col).to_numpy(zero_copy_only=False).astype(np.float64)
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return pc.list_value_length(col).cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.float64)
    if pa.types.is_timestamp(t):
        return col.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.float64)
    return None


class _ProfilePartial:
    """Actor-pool callable: one partial sketch row per (partition,
    column) per batch. Stats on numeric view; HLL on raw values."""

    def __init__(self, columns: list[str], partition_col: str | None, num_partitions: int):
        self.columns = columns
        self.partition_col = partition_col
        self.P = num_partitions

    def __call__(self, t: pa.Table) -> pa.Table:
        from . import hashing

        if len(t) == 0:
            return _PARTIAL_SCHEMA.empty_table()
        if self.partition_col:
            pids = hashing.partition_ids(t[self.partition_col], self.P)
        else:
            pids = np.zeros(len(t), dtype=np.int32)
        rows = {name: [] for name in _PARTIAL_SCHEMA.names}
        for pid in np.unique(pids):
            sel = pids == pid
            sub = t.filter(pa.array(sel))
            for c in self.columns:
                col = sub[c]
                nv = _numeric_view(col)
                n = len(col)
                if nv is not None:
                    # Arrow nulls surface as NaN in the float view, so
                    # NaN-count = nulls + genuine NaNs (both "null" per
                    # the NaN policy, vald.kernels docstring)
                    n_null = int(np.isnan(nv).sum())
                    vals = nv[~np.isnan(nv)]
                else:
                    n_null = col.null_count
                    vals = np.empty(0)
                td = TDigest().update(vals)
                hll = HLL()
                ct = col.type
                hashable = not (
                    pa.types.is_list(ct)
                    or pa.types.is_large_list(ct)
                    or pa.types.is_fixed_size_list(ct)
                    or pa.types.is_struct(ct)
                    or pa.types.is_map(ct)
                )
                if hashable:
                    nonnull = col.drop_null()
                    if len(nonnull):
                        hll.update_hashes(
                            hash64_values(nonnull.to_numpy(zero_copy_only=False))
                        )
                rows["partition_id"].append(int(pid))
                rows["column"].append(c)
                rows["n"].append(n)
                rows["n_null"].append(n_null)
                rows["min"].append(float(vals.min()) if len(vals) else float("nan"))
                rows["max"].append(float(vals.max()) if len(vals) else float("nan"))
                rows["sum"].append(float(vals.sum()) if len(vals) else 0.0)
                rows["tdigest"].append(td.serialize())
                rows["hll"].append(hll.serialize())
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], type=f.type) for f in _PARTIAL_SCHEMA],
            schema=_PARTIAL_SCHEMA,
        )


def _merge_group(g: pa.Table) -> pa.Table:
    n = int(pc.sum(g["n"]).as_py() or 0)
    n_null = int(pc.sum(g["n_null"]).as_py() or 0)
    mins = [v for v in g["min"].to_pylist() if v is not None and not np.isnan(v)]
    maxs = [v for v in g["max"].to_pylist() if v is not None and not np.isnan(v)]
    total = float(pc.sum(g["sum"]).as_py() or 0.0)
    td = TDigest()
    hll = HLL()
    for b in g["tdigest"].to_pylist():
        td.merge(TDigest.deserialize(b))
    for b in g["hll"].to_pylist():
        hll.merge(HLL.deserialize(b))
    n_valid = n - n_null
    row = {
        "partition_id": [g["partition_id"][0].as_py()],
        "column": [g["column"][0].as_py()],
        "n": [n],
        "n_null": [n_null],
        "n_distinct": [int(round(hll.estimate()))],
        "min": [min(mins) if mins else float("nan")],
        "max": [max(maxs) if maxs else float("nan")],
        "mean": [total / n_valid if n_valid else float("nan")],
        "p50": [td.quantile(0.5)],
        "p90": [td.quantile(0.9)],
        "p99": [td.quantile(0.99)],
        "tdigest": [td.serialize()],
        "hll": [hll.serialize()],
    }
    return pa.Table.from_arrays(
        [pa.array(row[f.name], type=f.type) for f in PROFILE_SCHEMA],
        schema=PROFILE_SCHEMA,
    )


def profile(
    ds: "ray.data.Dataset",
    columns: list[str],
    *,
    partition_col: str | None = None,
    num_partitions: int = 8,
    concurrency: int | tuple[int, int] = (1, 8),
) -> "ray.data.Dataset":
    """B6: one profile row per (partition, column). Sketch mode —
    HLL distinct + t-digest quantiles; exact stats (n, null, min, max,
    mean) are exact regardless. The shuffle moves only sketch rows."""
    partials = ds.map_batches(
        _ProfilePartial,
        fn_constructor_kwargs={
            "columns": columns,
            "partition_col": partition_col,
            "num_partitions": num_partitions,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
    return partials.groupby(["partition_id", "column"]).map_groups(
        _merge_group, batch_format="pyarrow"
    )



# ---------------------------------------------------------------------------
# Exact distributed quantiles WITHOUT a sort (B6 exact mode at scale)
# ---------------------------------------------------------------------------


def _valid_f64(c: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Column → float64 numpy with NULL and NaN removed (quantiles are
    defined over comparable values; NULL/NaN are skipped like SQL
    aggregate inputs)."""
    v = pc.cast(c, pa.float64()).to_numpy(zero_copy_only=False)
    return v[~np.isnan(v)]


def _run_small(ds: "ray.data.Dataset") -> pa.Table:
    from .runtime import collect_arrow

    return collect_arrow(ds)


def _lerp(v_lo: float, v_hi: float, frac: float) -> float:
    """quantile_cont interpolation, exact at the endpoints and stable
    when a bracket endpoint is ±inf (naive lerp gives inf - inf = NaN;
    the mathematical limit is the infinite endpoint)."""
    if frac == 0.0 or v_lo == v_hi:
        return v_lo
    if frac == 1.0:
        return v_hi
    if not math.isfinite(v_lo) and not math.isfinite(v_hi):
        return float("nan")  # strictly between -inf and +inf: indeterminate
    if not math.isfinite(v_lo):
        return v_lo
    if not math.isfinite(v_hi):
        return v_hi
    return v_lo + (v_hi - v_lo) * frac


def _rank_plan(n: int, qs) -> "tuple[list, list]":
    """quantile_cont interpolation plan: per q the two order statistics
    (0-based global ranks) and the fraction between them."""
    plan, needed = [], set()
    for q in qs:
        pos = (n - 1) * q
        k_lo, k_hi = int(math.floor(pos)), int(math.ceil(pos))
        plan.append((q, k_lo, k_hi, pos - k_lo))
        needed.add(k_lo)
        needed.add(k_hi)
    return plan, sorted(needed)


def _hist_one(x: np.ndarray, lo: float, hi: float, buckets: int):
    """Histogram of x over closed [lo, hi]: (bucket ids, counts, per-
    bucket min, per-bucket max). The bucket map is monotone in x, so a
    bucket's observed [min, max] contains exactly its members."""
    span = hi - lo
    if not math.isfinite(span):
        # Degenerate span (data straddles ~the whole float64 range):
        # hi-lo overflows to inf, the affine map collapses every value
        # into bucket 0 and the interval never narrows — after
        # max_passes the fallback would collect the WHOLE column,
        # violating collect_cap (ADVICE r4). Bisect at the midpoint
        # instead (lo/2+hi/2 is overflow-safe and the 2-bucket map is
        # still monotone); each half has a finite span, so the normal
        # map resumes next pass.
        mid = lo / 2.0 + hi / 2.0
        b = (x > mid).astype(np.int64)
    else:
        # divide BEFORE multiplying: (x-lo) ≤ span is finite, but
        # (x-lo)*buckets can overflow for spans near float64 max
        b = ((x - lo) / span * buckets).astype(np.int64)
        np.clip(b, 0, buckets - 1, out=b)
    ub, inv = np.unique(b, return_inverse=True)
    cnt = np.bincount(inv).astype(np.int64)
    mn = np.full(ub.size, np.inf)
    np.minimum.at(mn, inv, x)
    mx = np.full(ub.size, -np.inf)
    np.maximum.at(mx, inv, x)
    return ub, cnt, mn, mx


def _advance(st: dict, g: "pd.DataFrame") -> None:
    """Walk a merged (bucket, cnt, mn, mx) histogram to the bucket
    holding rank ``st['r']``; shrink the state interval to it."""
    cum = g["cnt"].cumsum().to_numpy()
    j = int(np.searchsorted(cum, st["r"], side="right"))
    prev = int(cum[j - 1]) if j else 0
    row = g.iloc[j]
    st["lo"], st["hi"] = float(row["mn"]), float(row["mx"])
    st["r"] -= prev
    st["cnt"] = int(row["cnt"])


def exact_quantiles(
    ds: "ray.data.Dataset",
    col: str,
    qs,
    *,
    buckets: int = 4096,
    collect_cap: int = 1_000_000,
    max_passes: int = 64,
) -> dict:
    """EXACT interpolated quantiles (SQL ``quantile_cont`` semantics)
    via iterative histogram narrowing — distributed selection, never a
    sort and never an O(n) driver/reduce materialization.

    Ray 2.49's ``Quantile`` aggregate accumulates every value through
    the reduce (one Python list per block, concatenated at merge), so
    "exact quantile" was the one profile stat whose cost scaled with
    the DATA, not the sketch. This replaces it with the classic
    iterative-refinement selection (distributed k-th order statistic
    via MPP histogram refinement): each pass histograms every DISTINCT
    unresolved interval once (order statistics sharing an interval —
    e.g. the two ranks bracketing one quantile — share the histogram),
    emitting per-batch (interval, bucket, count, min, max) partials;
    the driver walks the merged histogram to each target rank's bucket
    and the interval shrinks to that bucket's OBSERVED [min, max]
    (exact: the bucket map is monotone, so the closed interval holds
    exactly that bucket's members). When an interval holds ≤
    ``collect_cap`` values (or one distinct value) its survivors are
    pulled once as Arrow batches — never more than ``collect_cap``
    float64s per interval, a few MB — and all ranks inside it are
    answered exactly with one ``np.partition``. Convergence: intervals
    shrink ~``buckets``× per pass, so passes ≈
    ``log_buckets(n / collect_cap)`` + 2 (3–4 at 10^12 rows); each
    pass scans ONLY ``col`` (column-pruned).

    Returns ``{q: value}`` with ``None`` for an empty/all-null column.
    NaN is excluded like NULL."""
    import pandas as pd

    qs = list(qs)
    for q in qs:
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"quantile {q} outside [0, 1]")
    pruned = ds.select_columns([col])

    def bounds(t: pa.Table) -> pa.Table:
        v = _valid_f64(t[col])
        if v.size == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "neg": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        f = v[np.isfinite(v)]
        return pa.table({
            "n": pa.array([f.size], pa.int64()),
            "neg": pa.array([int((v == -np.inf).sum())], pa.int64()),
            "pos": pa.array([int((v == np.inf).sum())], pa.int64()),
            "lo": pa.array([float(f.min()) if f.size else None], pa.float64()),
            "hi": pa.array([float(f.max()) if f.size else None], pa.float64()),
        })

    bt = _run_small(
        pruned.map_batches(bounds, batch_format="pyarrow", zero_copy_batch=True)
    )
    if bt.num_columns == 0 or len(bt) == 0:
        return {q: None for q in qs}
    n_fin = int(pc.sum(bt["n"]).as_py())
    n_neg = int(pc.sum(bt["neg"]).as_py())
    n_pos = int(pc.sum(bt["pos"]).as_py())
    n = n_fin + n_neg + n_pos
    glo = pc.min(bt["lo"]).as_py()
    ghi = pc.max(bt["hi"]).as_py()

    # ±inf sort below/above every finite value: ranks outside the
    # finite band resolve immediately; the narrowing interval (and the
    # v>=lo & v<=hi pass filters) stay finite
    plan, ks = _rank_plan(n, qs)
    state, value = {}, {}
    for k in ks:
        if k < n_neg:
            value[k] = float("-inf")
        elif k >= n_neg + n_fin:
            value[k] = float("inf")
        else:
            state[k] = {"lo": float(glo), "hi": float(ghi),
                        "r": k - n_neg, "cnt": n_fin}

    for _ in range(max_passes):
        for k in list(state):
            if state[k]["lo"] == state[k]["hi"]:
                value[k] = state.pop(k)["lo"]
        big = [k for k, st in state.items() if st["cnt"] > collect_cap]
        if not big:
            break
        # one histogram per DISTINCT interval, shared by its ranks
        ivals: dict = {}
        for k in big:
            ivals.setdefault((state[k]["lo"], state[k]["hi"]), []).append(k)
        targets = tuple(
            (iid, lo, hi) for iid, (lo, hi) in enumerate(ivals)
        )

        def hist_part(t: pa.Table, targets=targets) -> pa.Table:
            v = _valid_f64(t[col])
            i_o, b_o, cnt_o, mn_o, mx_o = [], [], [], [], []
            for iid, lo, hi in targets:
                x = v[(v >= lo) & (v <= hi)]
                if x.size == 0:
                    continue
                ub, cnt, mn, mx = _hist_one(x, lo, hi, buckets)
                i_o.append(np.full(ub.size, iid, dtype=np.int64))
                b_o.append(ub); cnt_o.append(cnt); mn_o.append(mn); mx_o.append(mx)
            if not i_o:
                return pa.table({"i": pa.array([], pa.int64()),
                                 "b": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64()),
                                 "mn": pa.array([], pa.float64()),
                                 "mx": pa.array([], pa.float64())})
            return pa.table({"i": pa.array(np.concatenate(i_o)),
                             "b": pa.array(np.concatenate(b_o)),
                             "cnt": pa.array(np.concatenate(cnt_o)),
                             "mn": pa.array(np.concatenate(mn_o)),
                             "mx": pa.array(np.concatenate(mx_o))})

        ht = (
            _run_small(
                pruned.map_batches(
                    hist_part, batch_format="pyarrow", zero_copy_batch=True
                )
            )
            .to_pandas()
            .groupby(["i", "b"], sort=True)
            .agg(cnt=("cnt", "sum"), mn=("mn", "min"), mx=("mx", "max"))
            .reset_index()
        )
        for iid, ks_here in enumerate(ivals.values()):
            g = ht[ht["i"] == iid]
            for k in ks_here:
                _advance(state[k], g)

    for k in list(state):
        if state[k]["lo"] == state[k]["hi"]:
            value[k] = state.pop(k)["lo"]
    if state:
        # collect each DISTINCT interval once; one np.partition answers
        # every rank inside it
        ivals = {}
        for k in state:
            ivals.setdefault((state[k]["lo"], state[k]["hi"]), []).append(k)
        targets = tuple((iid, lo, hi) for iid, (lo, hi) in enumerate(ivals))

        def collect(t: pa.Table, targets=targets) -> pa.Table:
            v = _valid_f64(t[col])
            i_o, v_o = [], []
            for iid, lo, hi in targets:
                x = v[(v >= lo) & (v <= hi)]
                if x.size:
                    i_o.append(np.full(x.size, iid, dtype=np.int64))
                    v_o.append(x)
            if not i_o:
                return pa.table({"i": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.float64())})
            return pa.table({"i": pa.array(np.concatenate(i_o)),
                             "v": pa.array(np.concatenate(v_o))})

        ct = _run_small(
            pruned.map_batches(collect, batch_format="pyarrow", zero_copy_batch=True)
        )
        ii = ct["i"].to_numpy(zero_copy_only=False).astype(np.int64)
        vv = ct["v"].to_numpy(zero_copy_only=False).astype(np.float64)
        for iid, ks_here in enumerate(ivals.values()):
            xs = vv[ii == iid]
            rs = sorted({state[k]["r"] for k in ks_here})
            part = np.partition(xs, rs)
            for k in ks_here:
                value[k] = float(part[state[k]["r"]])

    out = {}
    for q, k_lo, k_hi, frac in plan:
        out[q] = _lerp(value[k_lo], value[k_hi], frac)
    return out


def exact_quantiles_grouped(
    ds: "ray.data.Dataset",
    col: str,
    by: str,
    qs,
    *,
    buckets: int = 4096,
    collect_cap: int = 1_000_000,
    max_passes: int = 64,
    max_groups: int = 100_000,
) -> dict:
    """Grouped ``exact_quantiles``: exact quantile_cont per ``by``
    group, same histogram-narrowing selection with one target per
    DISTINCT (group, interval) — all groups refine in the SAME
    column-pruned pass, so the pass count tracks the largest group,
    not the group count.

    Returns ``{group_value: {q: value}}``. Driver state is
    O(groups × intervals × buckets) partial rows per pass and ≤
    ``collect_cap`` collected survivors per (group, interval) — never
    O(rows). Group cardinality is capped at ``max_groups`` (the
    per-batch refinement loops over active (group, interval) targets;
    past ~10^5 groups use the t-digest sketch twin
    ``ops.stats.group_quantile_sketch``). NULL group keys form their
    own group (SQL GROUP BY); NULL/NaN values are skipped per group."""
    import pandas as pd

    qs = list(qs)
    for q in qs:
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"quantile {q} outside [0, 1]")
    pruned = ds.select_columns([by, col])

    def g_bounds(t: pa.Table) -> pa.Table:
        vn = pc.cast(t[col], pa.float64()).to_numpy(zero_copy_only=False)
        fin = np.isfinite(vn)
        small = pa.table({
            by: t[by],
            "__v": pa.array(vn, mask=~fin),  # finite-only for min/max/count
            "neg": pa.array((vn == -np.inf).astype(np.int64)),
            "pos": pa.array((vn == np.inf).astype(np.int64)),
        })
        agg = small.group_by([by], use_threads=False).aggregate(
            [("__v", "count"), ("__v", "min"), ("__v", "max"),
             ("neg", "sum"), ("pos", "sum")]
        )
        return agg.rename_columns([by, "n", "lo", "hi", "neg", "pos"])

    bt = _run_small(
        pruned.map_batches(g_bounds, batch_format="pyarrow", zero_copy_batch=True)
    )
    if bt.num_columns == 0 or len(bt) == 0:
        return {}
    gb = (
        bt.to_pandas()
        .groupby(by, dropna=False, sort=True)
        .agg(n=("n", "sum"), lo=("lo", "min"), hi=("hi", "max"),
             neg=("neg", "sum"), pos=("pos", "sum"))
        .reset_index()
    )
    if len(gb) > max_groups:
        raise ValueError(
            f"{len(gb)} groups exceeds max_groups={max_groups}; "
            "use ops.stats.group_quantile_sketch for extreme cardinality"
        )
    groups = list(gb[by])

    def _isnull(g) -> bool:
        return g is None or (isinstance(g, float) and np.isnan(g))

    non_null_groups = [g for g in groups if not _isnull(g)]
    nn_gid = np.asarray(
        [i for i, g in enumerate(groups) if not _isnull(g)] or [0],
        dtype=np.int64,
    )
    null_gid = next((i for i, g in enumerate(groups) if _isnull(g)), -1)

    def _group_codes(t: pa.Table) -> np.ndarray:
        """Row → gid (index into ``groups``); NULL keys map to the
        null group's gid (-1 = no null group ⇒ matches no target)."""
        codes = pd.Categorical(
            t[by].to_pandas(), categories=non_null_groups
        ).codes.astype(np.int64)
        return np.where(codes >= 0, nn_gid[np.clip(codes, 0, None)], null_gid)

    # state per (gid, k); plan per gid; ±inf ranks resolve at init
    # (they sort outside the finite band, same rule as ungrouped)
    state: dict = {}
    plan: dict = {}
    value: dict = {}
    for gid, row in gb.iterrows():
        n_fin, n_neg, n_pos = int(row["n"]), int(row["neg"]), int(row["pos"])
        n_tot = n_fin + n_neg + n_pos
        if n_tot == 0:  # group exists but every value is NULL/NaN
            plan[gid] = None
            continue
        g_plan, g_ks = _rank_plan(n_tot, qs)
        plan[gid] = g_plan
        for k in g_ks:
            if k < n_neg:
                value[(gid, k)] = float("-inf")
            elif k >= n_neg + n_fin:
                value[(gid, k)] = float("inf")
            else:
                state[(gid, k)] = {
                    "lo": float(row["lo"]), "hi": float(row["hi"]),
                    "r": k - n_neg, "cnt": n_fin,
                }

    def _dedup_targets(keys) -> "tuple[dict, tuple]":
        ivals: dict = {}
        for key in keys:
            st = state[key]
            gid = key[0]
            ivals.setdefault((gid, st["lo"], st["hi"]), []).append(key)
        targets = tuple(
            (iid, gid, lo, hi) for iid, (gid, lo, hi) in enumerate(ivals)
        )
        return ivals, targets

    for _ in range(max_passes):
        for key in list(state):
            if state[key]["lo"] == state[key]["hi"]:
                value[key] = state.pop(key)["lo"]
        big = [key for key, st in state.items() if st["cnt"] > collect_cap]
        if not big:
            break
        ivals, targets = _dedup_targets(big)

        def hist_part(t: pa.Table, targets=targets) -> pa.Table:
            v = pc.cast(t[col], pa.float64()).to_numpy(zero_copy_only=False)
            gc = _group_codes(t)
            ok = ~np.isnan(v)
            i_o, b_o, cnt_o, mn_o, mx_o = [], [], [], [], []
            for iid, gid, lo, hi in targets:
                x = v[ok & (gc == gid) & (v >= lo) & (v <= hi)]
                if x.size == 0:
                    continue
                ub, cnt, mn, mx = _hist_one(x, lo, hi, buckets)
                i_o.append(np.full(ub.size, iid, dtype=np.int64))
                b_o.append(ub); cnt_o.append(cnt); mn_o.append(mn); mx_o.append(mx)
            if not i_o:
                return pa.table({"i": pa.array([], pa.int64()),
                                 "b": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64()),
                                 "mn": pa.array([], pa.float64()),
                                 "mx": pa.array([], pa.float64())})
            return pa.table({"i": pa.array(np.concatenate(i_o)),
                             "b": pa.array(np.concatenate(b_o)),
                             "cnt": pa.array(np.concatenate(cnt_o)),
                             "mn": pa.array(np.concatenate(mn_o)),
                             "mx": pa.array(np.concatenate(mx_o))})

        ht = (
            _run_small(
                pruned.map_batches(
                    hist_part, batch_format="pyarrow", zero_copy_batch=True
                )
            )
            .to_pandas()
            .groupby(["i", "b"], sort=True)
            .agg(cnt=("cnt", "sum"), mn=("mn", "min"), mx=("mx", "max"))
            .reset_index()
        )
        for iid, keys_here in enumerate(ivals.values()):
            g = ht[ht["i"] == iid]
            for key in keys_here:
                _advance(state[key], g)

    for key in list(state):
        if state[key]["lo"] == state[key]["hi"]:
            value[key] = state.pop(key)["lo"]
    if state:
        ivals, targets = _dedup_targets(state)

        def collect(t: pa.Table, targets=targets) -> pa.Table:
            v = pc.cast(t[col], pa.float64()).to_numpy(zero_copy_only=False)
            gc = _group_codes(t)
            ok = ~np.isnan(v)
            i_o, v_o = [], []
            for iid, gid, lo, hi in targets:
                x = v[ok & (gc == gid) & (v >= lo) & (v <= hi)]
                if x.size:
                    i_o.append(np.full(x.size, iid, dtype=np.int64))
                    v_o.append(x)
            if not i_o:
                return pa.table({"i": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.float64())})
            return pa.table({"i": pa.array(np.concatenate(i_o)),
                             "v": pa.array(np.concatenate(v_o))})

        ct = _run_small(
            pruned.map_batches(collect, batch_format="pyarrow", zero_copy_batch=True)
        )
        ii = ct["i"].to_numpy(zero_copy_only=False).astype(np.int64)
        vv = ct["v"].to_numpy(zero_copy_only=False).astype(np.float64)
        for iid, keys_here in enumerate(ivals.values()):
            xs = vv[ii == iid]
            rs = sorted({state[key]["r"] for key in keys_here})
            part = np.partition(xs, rs)
            for key in keys_here:
                value[key] = float(part[state[key]["r"]])

    out: dict = {}
    for gid, items in plan.items():
        gkey = groups[gid]
        if items is None:  # all-NULL group: SQL quantile_cont is NULL
            out[gkey] = {q: None for q in qs}
            continue
        out[gkey] = {}
        for q, k_lo, k_hi, frac in items:
            out[gkey][q] = _lerp(value[(gid, k_lo)], value[(gid, k_hi)], frac)
    return out

"""Benchmark decontamination (training-data curation op).

The standard recipe (public GPT-3 / PaLM / Llama appendix methodology):
flag any training document that shares at least one token ``width``-gram
with an evaluation/benchmark set, then drop (or report) the overlapping
docs so eval answers can't leak into training.

Computed EXACTLY on the gram strings — no hashing approximation — so a
DuckDB oracle can reproduce it (see queries.q_decontam).

Shape (100 TB): the eval side is small BY DEFINITION (benchmark suites
are thousands of documents, not billions), so its distinct gram set is
collected once on the driver, ``ray.put`` once, and membership-tested
per corpus batch with ``pc.is_in`` — the corpus streams, nothing
shuffles. ``max_eval_grams`` guards the broadcast assumption explicitly
instead of letting a mis-sized "eval set" OOM the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .dedup import token_grams


def eval_gram_set(
    eval_ds: "ray.data.Dataset",
    text_col: str,
    *,
    width: int = 8,
    max_eval_grams: int = 50_000_000,
) -> pa.Array:
    """Distinct token ``width``-grams of the eval set, as one Arrow
    string array on the driver. Per-batch distinct first (one
    dictionary-encode), so the driver unions pre-deduped slabs."""

    def distinct_grams(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[text_col]))
        if len(t) == 0:
            return pa.table({"gram": pa.array([], type=pa.string())})
        grams, _, _ = token_grams(t, text_col, width)
        if len(grams) == 0:
            return pa.table({"gram": pa.array([], type=pa.string())})
        return pa.table({"gram": pc.unique(grams)})

    parts = ray.get(
        eval_ds.map_batches(
            distinct_grams, batch_format="pyarrow", zero_copy_batch=True
        ).to_arrow_refs()
    )
    parts = [p for p in parts if len(p)]
    if not parts:
        return pa.array([], type=pa.string())
    grams = pc.unique(pa.concat_tables(parts)["gram"].combine_chunks())
    if len(grams) > max_eval_grams:
        raise ValueError(
            f"eval set produced {len(grams)} distinct {width}-grams "
            f"(> max_eval_grams={max_eval_grams}); decontamination "
            "broadcasts the eval gram set — pass a real benchmark-sized "
            "eval set or raise the bound explicitly"
        )
    return grams


def decontaminate(
    ds: "ray.data.Dataset",
    eval_ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    *,
    width: int = 8,
    mode: str = "stats",
    max_overlap: int = 0,
    max_eval_grams: int = 50_000_000,
) -> "ray.data.Dataset":
    """Eval-set n-gram overlap over a corpus.

    ``mode="stats"``: one row per doc with at least one window —
    ``(id_col, n_windows, n_eval_windows)`` where ``n_eval_windows``
    counts the doc's ``width``-gram windows that appear anywhere in
    ``eval_ds`` (zero-window docs are omitted, mirroring the SQL
    formulation).

    ``mode="filter"``: the clean corpus — input rows whose eval-gram
    overlap is <= ``max_overlap`` (docs with NULL text or fewer than
    ``width`` tokens have no windows, cannot be contaminated, and are
    kept).
    """
    if mode not in ("stats", "filter"):
        raise ValueError(f"mode must be 'stats' or 'filter', got {mode!r}")
    grams_ref = ray.put(
        eval_gram_set(
            eval_ds, text_col, width=width, max_eval_grams=max_eval_grams
        )
    )

    def overlap(t: pa.Table) -> tuple[pa.Table, np.ndarray, np.ndarray]:
        """(non-null-text rows, n_windows, n_eval_windows) per row."""
        tt = t.filter(pc.is_valid(t[text_col]))
        if len(tt) == 0:
            return tt, np.empty(0, np.int64), np.empty(0, np.int64)
        value_set = ray.get(grams_ref)
        grams, doc_idx, nw = token_grams(tt, text_col, width)
        hits = np.zeros(len(tt), dtype=np.int64)
        if len(grams) and len(value_set):
            bad = np.asarray(
                pc.fill_null(
                    pc.is_in(grams, value_set=value_set), False
                ).to_numpy(zero_copy_only=False),
                dtype=bool,
            )
            hits = np.bincount(doc_idx[bad], minlength=len(tt)).astype(np.int64)
        return tt, nw, hits

    if mode == "stats":

        def stats(t: pa.Table) -> pa.Table:
            id_type = t.schema.field(id_col).type
            tt, nw, hits = overlap(t)
            keep = nw > 0
            return pa.table(
                {
                    id_col: tt[id_col].filter(pa.array(keep))
                    if len(tt)
                    else pa.array([], type=id_type),
                    "n_windows": pa.array(nw[keep]),
                    "n_eval_windows": pa.array(hits[keep]),
                }
            )

        return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)

    def clean(t: pa.Table) -> pa.Table:
        tt, _, hits = overlap(t)
        contaminated = tt.filter(pa.array(hits > max_overlap))
        if len(contaminated) == 0:
            return t
        drop = contaminated[id_col].combine_chunks()
        keep = pc.invert(
            pc.fill_null(pc.is_in(t[id_col], value_set=drop), False)
        )
        return t.filter(keep)

    return ds.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)

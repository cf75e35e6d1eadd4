"""Data-selection importance weighting (DSIR-style, training-data op).

Given a small TARGET sample (the domain you want more of — e.g. a
high-quality reference corpus) and the big raw corpus, score every
corpus document by the log-likelihood ratio of its hashed token
n-gram features under the target vs the corpus ("background")
unigram-feature distributions:

    score(doc) = (1/|grams|) * sum_g [ log p_target(h(g)) - log p_bg(h(g)) ]

(Xie et al., "Data Selection for Language Models via Importance
Resampling", NeurIPS 2023 — public method description; features are
token n-grams hashed into ``num_features`` buckets, distributions are
add-one-smoothed hashed-feature counts.) Documents scoring high look
like the target; sampling proportional to exp(score) (or keeping the
top quantile via ops.curate.quantile_filter) is the selection step.

Shape (100 TB): the target is small BY DEFINITION — its feature-count
vector is built on the driver. The background distribution needs one
streaming pass: each batch emits its LOCAL feature-count vector
reduced to sparse (feature, count) rows, combined by a tiny
``bucketed_group_agg`` keyed on the int feature id (cardinality ≤
``num_features``, bounded by construction). The log-ratio vector —
``num_features`` float64s, a few MB — broadcasts once via ``ray.put``;
the scoring pass is then a pure vectorized gather + segment-sum per
batch. Zero row shuffles end to end.

Not SQL-expressible (hashed feature space + logs), so the driver
check is rows-only; correctness is pinned by a brute-force parity
test (tests/test_ops.py::TestImportance).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..runtime import bucketed_group_agg
from .dedup import token_grams


def _feature_ids(grams: pa.Array, num_features: int) -> np.ndarray:
    """Stable hash of gram strings into [0, num_features) — pandas
    siphash (process-stable, seed-free), same function on the target
    and corpus sides."""
    h = pd.util.hash_array(
        np.asarray(grams.to_numpy(zero_copy_only=False), dtype=object),
        categorize=False,
    )
    return (h % np.uint64(num_features)).astype(np.int64)


def target_feature_counts(
    texts: "pa.Array | list[str]",
    *,
    width: int = 2,
    num_features: int = 1 << 16,
) -> np.ndarray:
    """Dense feature-count vector of the (driver-held) target sample."""
    arr = pa.array(texts, type=pa.string()) if isinstance(texts, list) else texts
    t = pa.table({"text": arr})
    grams, _, _ = token_grams(t, "text", width)
    counts = np.zeros(num_features, dtype=np.int64)
    if len(grams):
        np.add.at(counts, _feature_ids(grams, num_features), 1)
    return counts


def importance_weights(
    ds: "ray.data.Dataset",
    target_texts: "pa.Array | list[str]",
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    width: int = 2,
    num_features: int = 1 << 16,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Score each corpus doc by the mean hashed-n-gram log-likelihood
    ratio target-vs-corpus. Returns ``(id_col, n_grams, score)``; docs
    with fewer than ``width`` tokens get ``n_grams = 0`` and NULL
    score."""
    tgt = target_feature_counts(
        target_texts, width=width, num_features=num_features
    )

    _EMPTY_BG = pa.table(
        {
            "f": pa.array([], type=pa.int64()),
            "cnt": pa.array([], type=pa.int64()),
        }
    )

    def bg_partial(t: pa.Table) -> pa.Table:
        grams, _, _ = token_grams(t, text_col, width)
        if len(grams) == 0:
            return _EMPTY_BG
        f = _feature_ids(grams, num_features)
        uf, cnt = np.unique(f, return_counts=True)
        return pa.table(
            {"f": pa.array(uf), "cnt": pa.array(cnt.astype(np.int64))}
        )

    bg_rows = bucketed_group_agg(
        ds.map_batches(bg_partial, batch_format="pyarrow", zero_copy_batch=True),
        "f",
        [("cnt", "sum")],
        num_buckets=num_buckets,
    ).to_pandas()
    bg = np.zeros(num_features, dtype=np.int64)
    if len(bg_rows):
        bg[bg_rows["f"].to_numpy()] = bg_rows["cnt"].to_numpy()

    # add-one smoothed log-ratio vector, broadcast once
    ratio = (
        np.log(tgt + 1.0)
        - np.log(float(tgt.sum()) + num_features)
        - np.log(bg + 1.0)
        + np.log(float(bg.sum()) + num_features)
    )
    ratio_ref = ray.put(ratio)

    def score(t: pa.Table) -> pa.Table:
        grams, doc_idx, nw = token_grams(t, text_col, width)
        r = ray.get(ratio_ref)
        tot = np.zeros(len(t), dtype=np.float64)
        if len(grams):
            np.add.at(tot, doc_idx, r[_feature_ids(grams, num_features)])
        n = nw.astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            sc = np.where(n > 0, tot / np.maximum(n, 1), np.nan)
        sc_col = pa.array(sc, type=pa.float64())
        sc_col = pc.if_else(
            pc.is_nan(sc_col), pa.scalar(None, pa.float64()), sc_col
        )
        return pa.table(
            {
                id_col: t[id_col],
                "n_grams": pa.array(n),
                "score": sc_col,
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)

"""LLM-training-data catalog queries: dedup, similarity, text quality, curation, sampling, packing, decontamination, importance, clustering.

Split from the single-file catalog (round 4, VERDICT item 6): shared
read/schema helpers live in ``vald.queries._shared``; the QUERIES /
ORACLE_SQL registries in ``vald.queries.registry`` are asserted
identical to the pre-split snapshot by tests/test_registry_split.py.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Quantile, Sum

from ._shared import _empty, _ensure_schema, _mkt_keys_ds, _read



# ---------------------------------------------------------------------------
# B11 exact dedup by content — keep min doc_id per distinct text
# ---------------------------------------------------------------------------


def q_exact_dedup(sf_dir: str):
    from ..ops.dedup import exact_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = exact_dedup(ds, "text", id_col="doc_id")
    return _ensure_schema(
        out.select_columns(["doc_id"]), pa.schema([("doc_id", pa.int64())])
    )



# ---------------------------------------------------------------------------
# text ops: token counts (oracle via string_split_regex)
# ---------------------------------------------------------------------------


def q_token_counts(sf_dir: str):
    from ..ops.text import TokenCount

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(
        TokenCount,
        fn_constructor_kwargs={"text_col": "text", "modes": ("ws",)},
        batch_format="pyarrow", concurrency=(1, 2),
    ).select_columns(["doc_id", "n_tokens_ws"])
    return _ensure_schema(
        out, pa.schema([("doc_id", pa.int64()), ("n_tokens_ws", pa.int64())])
    )



# ---------------------------------------------------------------------------
# similarity: exact cosine top-k (oracle via list_cosine_similarity)
# ---------------------------------------------------------------------------


def q_knn_cosine(sf_dir: str):
    import pyarrow.parquet as pq

    from ..ops.similarity import knn_brute

    # query vector = embedding of vec_id 0 (driver-side point lookup)
    emb_t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = None
    for i, v in enumerate(emb_t["vec_id"].to_pylist()):
        if v == 0:
            q = np.asarray(emb_t["embedding"][i].as_py(), dtype=np.float64)
            break
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    # ADAPTIVE over-fetch then re-rank on ROUNDED scores with vec_id
    # tiebreak — mirrors the oracle's ORDER BY round(sim,6) DESC,
    # vec_id LIMIT 10. Rounding is monotone, so the fetch is complete
    # when the smallest fetched rounded sim is strictly below the
    # rank-10 rounded sim (ADVICE r1+r2: a fixed 20 could miss a
    # >20-way rounded tie at the boundary).
    k = 20
    while True:
        out = knn_brute(ds, q[None, :], k=k, dtype=np.float64)
        df = out.to_pandas()
        exhausted = len(df) < k
        df["sim"] = df["score"].round(6)
        out10 = df.sort_values(["sim", "vec_id"], ascending=[False, True]).head(10)
        if (
            exhausted
            or len(out10) < 10
            or float(df["sim"].min()) < float(out10["sim"].iloc[-1])
        ):
            df = out10
            break
        k *= 4
    return pa.table(
        {
            "vec_id": pa.array(df["vec_id"].tolist(), type=pa.int64()),
            "sim": pa.array(df["sim"].tolist(), type=pa.float64()),
        }
    )



# ---------------------------------------------------------------------------
# rows-only ops queries (no SQL equivalent)
# ---------------------------------------------------------------------------


def q_near_dup_groups(sf_dir: str):
    """Distributed near-dup grouping: minhash pair Dataset → large-star /
    small-star connected components (never touches the driver)."""
    from ..ops.dedup import minhash_dedup_pairs_ds, near_dup_groups_ds

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = minhash_dedup_pairs_ds(
        ds, "text", "doc_id", num_perm=64, bands=16, threshold=0.5, concurrency=(1, 2)
    )
    return _ensure_schema(
        near_dup_groups_ds(pairs),
        pa.schema([("id", pa.int64()), ("group_id", pa.int64())]),
    )



def q_curate(sf_dir: str):
    """Composed curation pipeline over the documents table: language
    filter → quality filter → exact dedup → MinHash near-dup drop;
    returns the per-stage row accounting (rows-only — the composition
    has no single-SQL equivalent)."""
    from ..ops.curate import curate_corpus

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    _, rep = curate_corpus(
        ds,
        keep_langs={"en", "de", "es", "fr", "zh"},
        min_quality=0.2,
        exact_dedup_on="text",
        near_dup_threshold=0.5,
        concurrency=(1, 2),
    )
    return rep.to_table()



def q_embedding_dups(sf_dir: str):
    """Embedding-cosine near-dup pairs (sign-LSH + exact verify) over a
    deterministic planted-cluster corpus — the testdata embeddings have
    no near-dups (max pairwise cosine ≈ 0.48, measured), so the plant
    provides a non-trivial result like q_drift_corpus does."""
    import numpy as np

    from ..ops.similarity import embedding_dedup_pairs_ds

    rng = np.random.RandomState(5)
    dim, rows, ids = 32, [], []
    vid = 0
    for _ in range(150):
        c = rng.standard_normal(dim)
        c /= np.linalg.norm(c)
        for _ in range(3):
            rows.append((c + 0.02 * rng.standard_normal(dim)).astype(np.float32))
            ids.append(vid)
            vid += 1
    for _ in range(800):
        v = rng.standard_normal(dim)
        rows.append((v / np.linalg.norm(v)).astype(np.float32))
        ids.append(vid)
        vid += 1
    t = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array([r.tolist() for r in rows], type=pa.list_(pa.float32())),
        }
    )
    pairs = embedding_dedup_pairs_ds(
        ray.data.from_arrow(t), threshold=0.95, max_hamming=12
    )
    return _ensure_schema(
        pairs,
        pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()), ("cosine", pa.float64())]),
    )



def q_minhash_pairs(sf_dir: str):
    from ..ops.dedup import minhash_dedup_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return minhash_dedup_pairs(
        ds, "text", "doc_id", num_perm=64, bands=16, threshold=0.5, concurrency=(1, 2)
    )



def q_simhash_pairs(sf_dir: str):
    from ..ops.dedup import simhash_dedup_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_dedup_pairs(ds, "text", "doc_id", max_hamming=3)



def q_langid(sf_dir: str):
    from ..ops.text import language_id

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = language_id(ds, concurrency=(1, 2)).select_columns(["doc_id", "lang_pred"])
    return _ensure_schema(
        out, pa.schema([("doc_id", pa.int64()), ("lang_pred", pa.string())])
    )



def q_quality_scores(sf_dir: str):
    from ..ops.text import quality_scores

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = quality_scores(ds, concurrency=(1, 2)).select_columns(["doc_id", "quality_score"])
    return _ensure_schema(
        out, pa.schema([("doc_id", pa.int64()), ("quality_score", pa.float64())])
    )



def q_fingerprints(sf_dir: str):
    """Winnowing-style min-k document fingerprints (ops/text.Fingerprint)
    — rows-only: the rolling Rabin-Karp hash is not SQL-expressible;
    determinism + equal-text => equal-fingerprint are pinned in
    tests/test_ops.py."""
    from ..ops.text import fingerprints

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = fingerprints(ds, concurrency=(1, 2)).select_columns(
        ["doc_id", "fingerprint"]
    )
    return _ensure_schema(
        out, pa.schema([("doc_id", pa.int64()), ("fingerprint", pa.string())])
    )



def q_text_stats(sf_dir: str):
    """Vectorized per-document character/token statistics straight from
    the Arrow string buffers (ops.text.text_stats) — oracle-checked."""
    from ..ops.text import text_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _ensure_schema(
        text_stats(ds, "text", "doc_id"),
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_chars", pa.int64()),
                ("n_alpha", pa.int64()),
                ("n_digit", pa.int64()),
                ("n_tokens", pa.int64()),
            ]
        ),
    )



def q_jaccard_pairs(sf_dir: str):
    """EXACT all-pairs 12-gram Jaccard >= 0.5 via the distributed
    shingle inverted index (ops.dedup.jaccard_pairs_ds) — the
    oracle-checked exact twin of the MinHash-LSH estimate."""
    from ..ops.dedup import jaccard_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return jaccard_pairs(ds, "text", "doc_id", k=12, threshold=0.5)



def q_knn_ivf(sf_dir: str):
    from ..ops.similarity import IvfIndex, knn_ivf

    import pyarrow.parquet as pq

    emb_t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = np.asarray(emb_t["embedding"][0].as_py(), dtype=np.float32)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    idx = IvfIndex.train(ds, num_cells=8, sample_frac=0.2)
    return knn_ivf(ds, q[None, :], idx, k=10, nprobe=3)



# ---------------------------------------------------------------------------
# B13 deterministic hash sampling — the one sampling mode a SQL oracle
# can reproduce bit-for-bit (vald/ops/sample.py)
# ---------------------------------------------------------------------------


def q_pq_ann(sf_dir: str):
    """PQ-compressed approximate top-10 (train → uint8 encode → ADC
    scan) for the first embedding as query — ops.similarity.pq_*
    (Jégou et al. 2011). Rows-only: quantized distances have no SQL
    twin; recall vs exact is pinned by test_ops.test_pq_recall_*."""
    import pyarrow.parquet as pq

    from ..ops.similarity import pq_encode_ds, pq_topk, pq_train

    emb_t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    q = np.asarray(emb_t["embedding"][0].as_py(), dtype=np.float32)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    books = pq_train(ds, m=8, k=64, sample_rows=4000, iters=6)
    return pq_topk(pq_encode_ds(ds, books), q[None, :], books, k=10)



def q_sample(sf_dir: str):
    from ..ops.sample import hash_sample

    ev = _read(sf_dir, "events", ["event_id", "event_type"])
    out = hash_sample(ev, key="event_id", frac=0.1)
    return _ensure_schema(
        out, pa.schema([("event_id", pa.int64()), ("event_type", pa.string())])
    )



# ---------------------------------------------------------------------------
# Training-data op: corpus-level frequent-line removal (CCNet/RefinedWeb
# boilerplate dedup, ops.dedup.line_dedup_ds). delimiter=' ' makes the
# same operator a frequent-token filter the oracle reproduces with
# string_split + unnest (testdata docs are single-line).
# ---------------------------------------------------------------------------


def q_line_dedup(sf_dir: str):
    from ..ops.dedup import line_dedup_ds

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = line_dedup_ds(ds, "text", "doc_id", min_df=300, delimiter=" ").map_batches(
        lambda t: t.select(["doc_id", "n_lines", "n_removed"]),
        batch_format="pyarrow",
    )
    return _ensure_schema(
        out,
        pa.schema(
            [("doc_id", pa.int64()), ("n_lines", pa.int64()), ("n_removed", pa.int64())]
        ),
    )



# ---------------------------------------------------------------------------
# Training-data op: per-doc token repetition (the Gopher-style duplicate
# unigram quality signal, ops.text.repetition_stats) — stateless
# map_batches stage, no shuffle; literal-space split matches SQL
# string_split semantics exactly (keeps empty tokens)
# ---------------------------------------------------------------------------


def q_repetition(sf_dir: str):
    from ..ops.text import repetition_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = repetition_stats(ds, "text", "doc_id", delimiter=" ")
    return _ensure_schema(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_tokens", pa.int64()),
                ("n_distinct", pa.int64()),
            ]
        ),
    )



# ---------------------------------------------------------------------------
# B13 stratified sampling: deterministic fixed-n-per-group subsample
# (ops.sample.stratified_sample = Knuth-hash order + grouped_topk) —
# oracle = ROW_NUMBER() over the same hash, QUALIFY <= n
# ---------------------------------------------------------------------------


def q_stratified(sf_dir: str):
    from ..ops.sample import stratified_sample

    ds = _read(sf_dir, "events", ["event_id", "event_type"])
    out = stratified_sample(ds, "event_type", "event_id", 20)
    return _ensure_schema(
        out, pa.schema([("event_id", pa.int64()), ("event_type", pa.string())])
    )



# ---------------------------------------------------------------------------
# Curation: global-quantile quality cut (ops.curate.quantile_filter) —
# one sorted pass over the score column, scalar threshold broadcast,
# corpus streams through a vectorized compare
# ---------------------------------------------------------------------------


def q_quantile_filter(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_id", "value"]).map_batches(
        # NaN exclusion for float parity with the oracle isnan guard
        lambda t: t.filter(
            pc.and_(
                pc.is_valid(t["value"]),
                pc.fill_null(pc.invert(pc.is_nan(t["value"])), True),
            )
        ),
        batch_format="pyarrow",
    )
    from ..ops.curate import quantile_filter

    out = quantile_filter(ds, "value", 0.9)
    return _ensure_schema(
        out, pa.schema([("event_id", pa.int64()), ("value", pa.float64())])
    )



# ---------------------------------------------------------------------------
# Training-data op: duplicate-passage detection (ops.dedup.
# dup_span_stats_ds) — per-doc count of token 4-grams shared with >= 2
# distinct docs, EXACT on gram strings so the oracle reproduces it with
# list indexing + LATERAL generate_series
# ---------------------------------------------------------------------------


def q_dup_passages(sf_dir: str):
    from ..ops.dedup import dup_span_stats_ds

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = dup_span_stats_ds(ds, "text", "doc_id", width=4, min_df=2)
    return _ensure_schema(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_windows", pa.int64()),
                ("n_dup_windows", pa.int64()),
            ]
        ),
    )



# ---------------------------------------------------------------------------
# Training-data op: sequence packing (ops.pack.pack_sequences) —
# next-fit-decreasing into fixed-capacity context windows, bucket-local
# greedy (rows-only: greedy packing has no SQL formulation; invariants
# are pytest-checked)
# ---------------------------------------------------------------------------


def q_pack(sf_dir: str):
    from ..ops.pack import pack_sequences

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    out = pack_sequences(ds, "doc_id", "n_chars", cap=2000, num_buckets=8)
    return _ensure_schema(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_chars", pa.int64()),
                ("pack_id", pa.int64()),
                ("pack_pos", pa.int64()),
            ]
        ),
    )



# ---------------------------------------------------------------------------
# Training-data op: benchmark decontamination (ops.decontam) — flag docs
# sharing token n-grams with an eval set; the eval set here is the
# deterministic Knuth-hash sample of the corpus itself so the oracle can
# rebuild it in SQL (same literal threshold on both sides)
# ---------------------------------------------------------------------------

# int(0.05 * 2**32) — MUST match ops.sample.hash_sample's rounding
_DECONTAM_FRAC = 0.05

_DECONTAM_THRESHOLD = int(_DECONTAM_FRAC * (1 << 32))



def q_decontam(sf_dir: str):
    from ..ops.decontam import decontaminate
    from ..ops.sample import hash_sample

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    eval_ds = hash_sample(ds, "doc_id", _DECONTAM_FRAC)
    out = decontaminate(ds, eval_ds, "text", "doc_id", width=5, mode="stats")
    return _ensure_schema(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_windows", pa.int64()),
                ("n_eval_windows", pa.int64()),
            ]
        ),
    )



# ---------------------------------------------------------------------------
# Training-data op: PII detection + scrubbing (ops.text.regex_stats /
# scrub_text). Both pyarrow and DuckDB embed RE2, so non-overlapping
# match counts and global replacement agree by construction. The email
# preset exercises the zero-hit direction on this corpus; the keyword
# pattern exercises real hits and the rewrite path (value-hash covers
# every scrubbed string).
# ---------------------------------------------------------------------------

_PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"

_PII_KW = r"(stream|spark)[a-z]*"



def q_pii_scrub(sf_dir: str):
    from ..ops.text import regex_stats_table, scrub_table

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def per_batch(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["text"]))
        stats = regex_stats_table(
            t, "text", "doc_id", {"email": _PII_EMAIL, "kw": _PII_KW}
        )
        scrubbed = scrub_table(t, "text", {"kw": _PII_KW}, out_col="scrubbed")
        return stats.append_column("scrubbed", scrubbed["scrubbed"])

    return _ensure_schema(
        ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True),
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_email", pa.int64()),
                ("n_kw", pa.int64()),
                ("scrubbed", pa.string()),
            ]
        ),
    )



# ---------------------------------------------------------------------------
# Training-data op: context-length chunking (ops.text.split_documents) —
# sliding token windows with overlap, stateless explode, no shuffle.
# Caveat shared with every string_split oracle here: DuckDB keeps empty
# tokens on consecutive separators, the engine drops them (str.split
# semantics); this corpus is single-spaced so both agree.
# ---------------------------------------------------------------------------

_SPLIT_MAX, _SPLIT_OVERLAP = 40, 10



def q_split_docs(sf_dir: str):
    from ..ops.text import split_documents

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = split_documents(
        ds, "text", "doc_id", max_tokens=_SPLIT_MAX, overlap=_SPLIT_OVERLAP
    )
    return _ensure_schema(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("chunk_id", pa.int64()),
                ("chunk", pa.string()),
                ("n_tokens", pa.int64()),
            ]
        ),
    )



# ---------------------------------------------------------------------------
# Training-data op: deterministic global shuffle (ops.shuffle) — the
# shuffle ORDER itself is oracle-checked by ranking the hash-order
# with ops.rank.global_rank against ROW_NUMBER() over the same
# SQL-reproducible hash expression.
# ---------------------------------------------------------------------------


def q_shuffle(sf_dir: str):
    from ..ops.rank import global_rank
    from ..ops.shuffle import shuffle_hash

    ds = _read(sf_dir, "events", ["event_id"])

    def stamp(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["event_id"]))
        k = pc.fill_null(t["event_id"], 0).to_numpy(zero_copy_only=False)
        return t.append_column("__h", pa.array(shuffle_hash(k)))

    ranked = global_rank(
        ds.map_batches(stamp, batch_format="pyarrow", zero_copy_batch=True),
        "__h",
        "event_id",
        rank_col="pos",
    ).select_columns(["event_id", "pos"])
    return _ensure_schema(
        ranked, pa.schema([("event_id", pa.int64()), ("pos", pa.int64())])
    )



# ---------------------------------------------------------------------------
# Training-data op: per-group feature normalization (ops.stats
# .group_zscore) — two streaming passes, moments exchange only,
# broadcast stats gather. Oracle: SQL window AVG / STDDEV_POP.
# ---------------------------------------------------------------------------


def q_zscore(sf_dir: str):
    from ..ops.stats import group_zscore

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    out = group_zscore(ds, "event_type", "value").map_batches(
        lambda t: pa.table(
            {
                "event_id": t["event_id"],
                "z": pc.round(t["z"], 4),
            }
        ).filter(pc.is_valid(t["event_id"])),
        batch_format="pyarrow",
    )
    return _ensure_schema(
        out, pa.schema([("event_id", pa.int64()), ("z", pa.float64())])
    )



# ---------------------------------------------------------------------------
# Training-data op: DSIR-style importance weighting (ops.importance) —
# hashed-n-gram log-likelihood ratio vs a deterministic target sample.
# Hashed feature space + logs are not SQL-expressible: rows-only here;
# brute-force parity lives in tests/test_ops.py::TestImportance.
# ---------------------------------------------------------------------------


def q_importance(sf_dir: str):
    import pyarrow.parquet as pq

    from ..ops.importance import importance_weights

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # deterministic target sample: the q_sample Knuth-hash rule on doc_id
    k = docs["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    target = docs.filter(pa.array((k * 2654435761) % (1 << 32) < (1 << 32) // 10))
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = importance_weights(ds, target["text"].combine_chunks())
    return _ensure_schema(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_grams", pa.int64()),
                ("score", pa.float64()),
            ]
        ),
    )



# ---------------------------------------------------------------------------
# Text op: exact corpus TF-IDF (ops.text.tfidf_ds) — distinct-term df
# partials + bucketed combine, vocabulary broadcast, per-batch tf.
# ---------------------------------------------------------------------------


def q_tfidf(sf_dir: str):
    from ..ops.text import tfidf_ds

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = tfidf_ds(ds, "text", "doc_id").map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("tfidf"),
            "tfidf",
            pc.round(t["tfidf"], 6),
        ),
        batch_format="pyarrow",
    )
    return _ensure_schema(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("term", pa.string()),
                ("tf", pa.int64()),
                ("df", pa.int64()),
                ("tfidf", pa.float64()),
            ]
        ),
    )



# ---------------------------------------------------------------------------
# Feature-engineering op: pivoted count features (ops.stats
# .pivot_counts) — one wide partial per batch, one bucketed combine.
# ---------------------------------------------------------------------------


def q_pivot(sf_dir: str):
    from ..ops.stats import pivot_counts

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    out = pivot_counts(ds, "user_id", "event_type")
    schema = pa.schema(
        [("user_id", pa.int64())]
        + [
            (f"n_{c}", pa.int64())
            for c in ["click", "error", "purchase", "signup", "view"]
        ]
    )
    return _ensure_schema(out, schema)



# ---------------------------------------------------------------------------
# Text op: CCNet-style unigram-LM quality score (ops.text
# .unigram_logprob_ds) — mean token log-prob under the corpus's own
# unigram model; self-trained, so the SQL oracle reproduces it exactly.
# ---------------------------------------------------------------------------


def q_fuzzy_pairs(sf_dir: str):
    """Customer names within edit distance 1 — the SymSpell
    deletion-neighborhood fuzzy join (ops.dedup.edit_distance_pairs_ds);
    oracle = the quadratic self-join with DuckDB levenshtein (exact at
    sf0.01 grading scale; the Ray side never does all-pairs)."""
    from ..ops.dedup import edit_distance_pairs_ds

    out = edit_distance_pairs_ds(
        _read(sf_dir, "customer", ["c_custkey", "c_name"]),
        "c_name",
        "c_custkey",
    )
    return _ensure_schema(
        out,
        pa.schema(
            [
                ("id_a", pa.int64()),
                ("id_b", pa.int64()),
                ("ed", pa.int64()),
            ]
        ),
    )



def q_entropy(sf_dir: str):
    """Shannon entropy of the documents table's categorical columns
    (lang, source) — ops.stats.categorical_entropy_ds; the oracle
    recomputes H = -Σ p·ln p from per-value counts."""
    from ..ops.stats import categorical_entropy_ds

    ds = _read(sf_dir, "documents", ["lang", "source"])
    out = categorical_entropy_ds(ds, ["lang", "source"]).map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("entropy"),
            "entropy",
            pc.round(t["entropy"], 6),
        ),
        batch_format="pyarrow",
    )
    return _ensure_schema(
        out,
        pa.schema(
            [
                ("column", pa.string()),
                ("n", pa.int64()),
                ("n_distinct", pa.int64()),
                ("entropy", pa.float64()),
            ]
        ),
    )



# fixed retrieval query for q_bm25 (high-df corpus terms, so every sf
# has matches); mirrored literally in the oracle SQL
_BM25_TERMS = ("hash", "join", "scan")


def q_bm25(sf_dir: str):
    """Okapi BM25 of every document against the fixed query
    ('hash', 'join', 'scan') — ops.text.bm25_ds; oracle recomputes
    idf/tf/dl/avgdl from the same whitespace-token definition."""
    from ..ops.text import bm25_ds

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = bm25_ds(ds, "text", "doc_id", _BM25_TERMS).map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("bm25"),
            "bm25",
            pc.round(t["bm25"], 6),
        ),
        batch_format="pyarrow",
    )
    return _ensure_schema(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_tokens", pa.int64()),
                ("bm25", pa.float64()),
            ]
        ),
    )



def q_logprob(sf_dir: str):
    from ..ops.text import unigram_logprob_ds

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = unigram_logprob_ds(ds, "text", "doc_id").map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("logprob"),
            "logprob",
            pc.round(t["logprob"], 6),
        ),
        batch_format="pyarrow",
    )
    return _ensure_schema(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_tokens", pa.int64()),
                ("logprob", pa.float64()),
            ]
        ),
    )



# ---------------------------------------------------------------------------
# Curation: per-source token-budget selection (ops.sample
# .select_by_budget) — "take the longest docs per language until the
# token budget is spent"; oracle = SUM() OVER window filter.
# ---------------------------------------------------------------------------


def q_budget_select(sf_dir: str):
    from ..ops.sample import select_by_budget
    from ..ops.text import TokenCount

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])
    toks = ds.map_batches(
        TokenCount,
        fn_constructor_kwargs={"text_col": "text", "modes": ("ws",)},
        batch_format="pyarrow",
        concurrency=(1, 2),
    ).select_columns(["doc_id", "lang", "n_chars", "n_tokens_ws"])
    out = select_by_budget(
        toks,
        "lang",
        [("n_chars", "descending"), ("doc_id", "ascending")],
        "n_tokens_ws",
        2_000,
    )
    return _ensure_schema(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("lang", pa.string()),
                ("n_chars", pa.int64()),
                ("n_tokens_ws", pa.int64()),
                ("cum_tokens", pa.int64()),
            ]
        ),
    )



# ---------------------------------------------------------------------------
# Curation: deterministic mixture rebalancing (ops.sample.mix_sources)
# — downsample to a target language distribution at the largest
# achievable size; exact integer quotas so the SQL twin reproduces the
# selection bit-for-bit.
# ---------------------------------------------------------------------------

_MIX_TARGETS = {"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}



def q_mix(sf_dir: str):
    from ..ops.sample import mix_sources

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    out = mix_sources(ds, "lang", "doc_id", _MIX_TARGETS)
    return _ensure_schema(
        out, pa.schema([("doc_id", pa.int64()), ("lang", pa.string())])
    )



# ---------------------------------------------------------------------------
# Clustering + semantic dedup (ops.cluster) — iterative, not
# SQL-expressible; rows-only driver checks + parity tests in
# tests/test_ops.py::TestCluster.
# ---------------------------------------------------------------------------


def q_kmeans(sf_dir: str):
    """Full-data spherical k-means over the embeddings table: fit k=8
    centroids with distributed Lloyd passes, stamp assignments, return
    per-cluster size + mean centroid cosine (8 rows)."""
    from ..ops.cluster import kmeans_assign_ds, kmeans_fit_ds

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cents = kmeans_fit_ds(ds, k=8, iters=5, seed=7)
    stamped = kmeans_assign_ds(ds, cents)
    out = stamped.groupby("cluster").aggregate(
        ray.data.aggregate.Count(), ray.data.aggregate.Mean("centroid_sim")
    )
    return _ensure_schema(
        out.map_batches(
            lambda t: pa.table(
                {
                    "cluster": pc.cast(t["cluster"], pa.int32()),
                    "n": pc.cast(t["count()"], pa.int64()),
                    "mean_sim": pc.round(
                        pc.cast(t["mean(centroid_sim)"], pa.float64()), 6
                    ),
                }
            ),
            batch_format="pyarrow",
        ),
        pa.schema(
            [("cluster", pa.int32()), ("n", pa.int64()), ("mean_sim", pa.float64())]
        ),
    )



def q_semdedup(sf_dir: str):
    """SemDeDup over a planted-duplicate embedding corpus (the real
    embeddings table has no near-dups, measured in q_embedding_dups):
    150 clusters × 3 jittered copies + 800 singletons → survivors.
    Returns surviving vec_ids; the 150 planted triples should each
    collapse to ~1 exemplar at threshold 0.95."""
    import numpy as np

    from ..ops.cluster import semdedup_ds

    rng = np.random.RandomState(5)
    dim, rows, ids = 32, [], []
    vid = 0
    for _ in range(150):
        c = rng.standard_normal(dim)
        c /= np.linalg.norm(c)
        for _ in range(3):
            rows.append((c + 0.02 * rng.standard_normal(dim)).astype(np.float32))
            ids.append(vid)
            vid += 1
    for _ in range(800):
        v = rng.standard_normal(dim)
        rows.append((v / np.linalg.norm(v)).astype(np.float32))
        ids.append(vid)
        vid += 1
    t = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(
                [r.tolist() for r in rows], type=pa.list_(pa.float32())
            ),
        }
    )
    out = semdedup_ds(
        ray.data.from_arrow(t),
        threshold=0.95,
        k=16,
        iters=5,
        seed=3,
    ).select_columns(["vec_id"])
    return _ensure_schema(out, pa.schema([("vec_id", pa.int64())]))



def q_heavy_hitters(sf_dir: str):
    """Top-10 most frequent user_ids via the Misra-Gries heavy-hitters
    summary (ops.stats.heavy_hitters) in its EXACT regime (capacity >>
    per-batch distinct users ⇒ error bound E = 0, counts exact — the
    §5.3 sketch/exact duality; the compressed regime's bounds are
    pytest-verified)."""
    from ..ops.stats import heavy_hitters

    ds = _read(sf_dir, "events", ["user_id"])
    out = heavy_hitters(ds, "user_id", k=10, capacity=1_000_000)
    return _ensure_schema(
        ray.data.from_arrow(out),
        pa.schema(
            [
                ("user_id", pa.int64()),
                ("est_count", pa.int64()),
                ("max_count", pa.int64()),
            ]
        ),
    )



def q_label_centroids(sf_dir: str):
    """Per-label mean embedding (ops.stats.group_vector_mean — class
    centroids via segmented vector-sum partials + one small groupby),
    flattened to (label, dim, mean_val, n) long form so the DuckDB
    unnest/generate_subscripts oracle can value-hash it."""
    from ..ops.stats import group_vector_mean

    ds = _read(sf_dir, "embeddings", ["embedding", "label"])
    cent = group_vector_mean(ds, "label", "embedding")

    def explode(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "label": pa.array([], type=pa.int64()),
                    "dim": pa.array([], type=pa.int64()),
                    "mean_val": pa.array([], type=pa.float64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        d = pc.list_value_length(t["mean"]).to_numpy(zero_copy_only=False)
        rep = pa.array(
            np.repeat(np.arange(len(t), dtype=np.int64), d), type=pa.int64()
        )
        dims = np.concatenate([np.arange(1, k + 1, dtype=np.int64) for k in d])
        return pa.table(
            {
                "label": pc.cast(t["label"].take(rep), pa.int64()),
                "dim": pa.array(dims, type=pa.int64()),
                "mean_val": pc.round(pc.list_flatten(t["mean"]), ndigits=6),
                "n": t["n"].take(rep),
            }
        )

    out = cent.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    return _ensure_schema(
        out,
        pa.schema(
            [
                ("label", pa.int64()),
                ("dim", pa.int64()),
                ("mean_val", pa.float64()),
                ("n", pa.int64()),
            ]
        ),
    )



def q_group_quantile_sketch(sf_dir: str):
    """Per-event-type p10/p50/p90 of value via mergeable t-digests
    (ops.stats.group_quantile_sketch) — the B6 sketch twin of the
    exact grouped quantile; rows-only (digest merge order is
    partition-dependent ⇒ tolerance-stable, not bit-stable; the exact
    twin q_price_median_by_priority carries the oracle)."""
    from ..ops.stats import group_quantile_sketch

    ds = _read(sf_dir, "events", ["event_type", "value"])
    out = group_quantile_sketch(ds, "event_type", "value", [0.1, 0.5, 0.9])
    return _ensure_schema(
        out,
        pa.schema(
            [
                ("event_type", pa.string()),
                ("q", pa.float64()),
                ("value", pa.float64()),
                ("n", pa.int64()),
            ]
        ),
    )



def q_group_distinct_sketch(sf_dir: str):
    """Per-event-type approximate distinct users via mergeable HLLs
    (ops.stats.group_distinct_sketch) — B6 sketch twin of the exact
    grouped distinct count (q_daily_distinct carries the oracle);
    rows-only (HLL estimates are not SQL-expressible)."""
    from ..ops.stats import group_distinct_sketch

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    out = group_distinct_sketch(ds, "event_type", "user_id")
    return _ensure_schema(
        out,
        pa.schema(
            [("event_type", pa.string()), ("n_distinct_est", pa.float64())]
        ),
    )

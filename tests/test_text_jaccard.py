"""Round-3 ops tests: exact all-pairs n-gram Jaccard (distributed
shingle inverted index) and vectorized text_stats."""

import re

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from vald.ops import dedup as DD
from vald.ops.text import text_stats, text_stats_table


# ---------------------------------------------------------------------------
# corpus with planted near-dups, empties, and a NULL
# ---------------------------------------------------------------------------

_WORDS = (
    "table scan join filter sort hash merge batch window group "
    "row column value key part order line data query stream"
).split()


def _salad(rng: np.random.Generator, n_words: int) -> str:
    return " ".join(rng.choice(_WORDS, size=n_words))


def _dup_corpus():
    rng = np.random.default_rng(7)
    texts: list[str | None] = [_salad(rng, 60) for _ in range(40)]
    # planted near-dups: copy with a few words swapped
    for src in (3, 11, 29):
        w = texts[src].split()
        for _ in range(3):
            w[rng.integers(0, len(w))] = rng.choice(_WORDS)
        texts.append(" ".join(w))
    texts.append("")       # empty doc
    texts.append("")       # second empty doc (pairs with the first)
    texts.append(None)     # NULL text (treated as empty)
    ids = list(range(len(texts)))
    return pa.table({"doc_id": ids, "text": pa.array(texts, type=pa.string())})


def _shingles(s: str | None, k: int) -> set:
    s = s or ""
    return set(s[j : j + k] for j in range(max(1, len(s) - k + 1)))


def _brute_pairs(t: pa.Table, k: int, threshold: float) -> dict:
    ids = t["doc_id"].to_pylist()
    shs = [_shingles(s, k) for s in t["text"].to_pylist()]
    out = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = len(shs[i] & shs[j])
            union = len(shs[i] | shs[j])
            jac = inter / union if union else 1.0
            if jac >= threshold:
                a, b = sorted((ids[i], ids[j]))
                out[(a, b)] = round(jac, 6)
    return out


def test_jaccard_pairs_matches_bruteforce(ray_session):
    t = _dup_corpus()
    k, thr = 8, 0.4
    expect = _brute_pairs(t, k, thr)
    got_t = DD.jaccard_pairs(
        ray.data.from_arrow(t), "text", "doc_id", k=k, threshold=thr
    )
    got = {
        (a, b): j
        for a, b, j in zip(
            got_t["id_a"].to_pylist(),
            got_t["id_b"].to_pylist(),
            got_t["jaccard"].to_pylist(),
        )
    }
    assert set(got) == set(expect)
    for p in expect:
        assert abs(got[p] - expect[p]) < 1e-9
    # planted dups + the empty-doc pair must be present
    planted = {(3, 40), (11, 41), (29, 42), (43, 44)}
    assert planted <= set(got)


def test_jaccard_pairs_bucket_invariance(ray_session):
    """Same result at two bucket counts (partition invariance)."""
    t = _dup_corpus()
    a = DD.jaccard_pairs_ds(
        ray.data.from_arrow(t), "text", "doc_id", k=8, threshold=0.4, num_buckets=4
    )
    b = DD.jaccard_pairs_ds(
        ray.data.from_arrow(t), "text", "doc_id", k=8, threshold=0.4, num_buckets=64
    )
    pa_a = DD._pairs_table(a, "jaccard", pa.float64())
    pa_b = DD._pairs_table(b, "jaccard", pa.float64())
    assert pa_a.equals(pa_b)


def test_jaccard_join_fallback_path(ray_session):
    """max_broadcast_docs=0 forces the native-join verification path;
    result must be identical to the broadcast path."""
    t = _dup_corpus()
    a = DD.jaccard_pairs_ds(
        ray.data.from_arrow(t), "text", "doc_id", k=8, threshold=0.4
    )
    b = DD.jaccard_pairs_ds(
        ray.data.from_arrow(t),
        "text",
        "doc_id",
        k=8,
        threshold=0.4,
        max_broadcast_docs=0,
    )
    pa_a = DD._pairs_table(a, "jaccard", pa.float64())
    pa_b = DD._pairs_table(b, "jaccard", pa.float64())
    assert pa_a.equals(pa_b)


def test_jaccard_max_df_underestimates(ray_session):
    """max_df drops hot shingles: pairs must be a SUBSET of the exact
    result with never-higher jaccard (documented under-estimate)."""
    t = _dup_corpus()
    exact = DD.jaccard_pairs(
        ray.data.from_arrow(t), "text", "doc_id", k=8, threshold=0.4
    )
    capped = DD.jaccard_pairs(
        ray.data.from_arrow(t), "text", "doc_id", k=8, threshold=0.4, max_df=10
    )
    ex = {
        (a, b): j
        for a, b, j in zip(
            exact["id_a"].to_pylist(),
            exact["id_b"].to_pylist(),
            exact["jaccard"].to_pylist(),
        )
    }
    for a, b, j in zip(
        capped["id_a"].to_pylist(),
        capped["id_b"].to_pylist(),
        capped["jaccard"].to_pylist(),
    ):
        assert (a, b) in ex
        assert j <= ex[(a, b)] + 1e-9


# ---------------------------------------------------------------------------
# text_stats
# ---------------------------------------------------------------------------

_WS_RE = re.compile(rb"[\x09\x0a\x0b\x0c\x0d\x20]+")


def _py_stats(s: str | None) -> tuple[int, int, int, int]:
    b = (s or "").encode("utf-8")
    n_alpha = sum(1 for c in b if 65 <= c <= 90 or 97 <= c <= 122)
    n_digit = sum(1 for c in b if 48 <= c <= 57)
    n_tokens = len([tok for tok in _WS_RE.split(b) if tok])
    return len(b), n_alpha, n_digit, n_tokens


_EDGE_TEXTS = [
    "a b",
    "",
    None,
    "   ",
    "a\tb\nc\x0bd\x0ce\rf",
    "héllo wörld 42",
    "x" * 500,
    " lead and trail ",
    "tab\t\t\tmulti",
]


def test_text_stats_table_matches_python():
    t = pa.table(
        {
            "doc_id": list(range(len(_EDGE_TEXTS))),
            "text": pa.array(_EDGE_TEXTS, type=pa.string()),
        }
    )
    out = text_stats_table(t, "text", "doc_id").to_pydict()
    for i, s in enumerate(_EDGE_TEXTS):
        nc, na, nd, nt = _py_stats(s)
        assert out["n_chars"][i] == nc, (i, s)
        assert out["n_alpha"][i] == na, (i, s)
        assert out["n_digit"][i] == nd, (i, s)
        assert out["n_tokens"][i] == nt, (i, s)


def test_text_stats_table_sliced_and_chunked():
    t = pa.table(
        {
            "doc_id": list(range(len(_EDGE_TEXTS))),
            "text": pa.array(_EDGE_TEXTS, type=pa.string()),
        }
    )
    whole = text_stats_table(t, "text", "doc_id")
    sliced = text_stats_table(t.slice(2, 5), "text", "doc_id")
    assert whole.slice(2, 5).to_pydict() == sliced.to_pydict()
    chunked = pa.Table.from_batches(t.to_batches(max_chunksize=3))
    assert text_stats_table(chunked, "text", "doc_id").equals(whole)


def test_text_stats_dataset(ray_session):
    rng = np.random.default_rng(3)
    texts = [_salad(rng, int(n)) for n in rng.integers(1, 50, size=200)]
    t = pa.table({"doc_id": list(range(200)), "text": texts})
    out = (
        text_stats(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, s in enumerate(texts):
        nc, na, nd, nt = _py_stats(s)
        assert out.n_chars[i] == nc
        assert out.n_tokens[i] == nt
        assert out.n_alpha[i] == na
        assert out.n_digit[i] == nd


class TestEditDistancePairs:
    """ops.dedup.edit_distance_pairs_ds — SymSpell deletion-neighborhood
    fuzzy join: brute-force parity (insert/delete/substitute/equal),
    null/long-string drops, the low-entropy refusal."""

    @staticmethod
    def _brute(strs):
        def ed_le1(a, b):
            if a == b:
                return 0
            la, lb = len(a), len(b)
            if abs(la - lb) > 1:
                return None
            if la == lb:
                return 1 if sum(x != y for x, y in zip(a, b)) == 1 else None
            if la > lb:
                a, b = b, a
            i = 0
            while i < len(a) and a[i] == b[i]:
                i += 1
            return 1 if a[i:] == b[i + 1:] else None

        out = set()
        for i in range(len(strs)):
            for j in range(i + 1, len(strs)):
                if strs[i] is None or strs[j] is None:
                    continue
                d = ed_le1(strs[i], strs[j])
                if d is not None:
                    out.add((i, j, d))
        return sorted(out)

    def test_matches_bruteforce_random(self, ray_session):
        import random

        from vald.ops.dedup import edit_distance_pairs_ds

        rng = random.Random(17)
        alphabet = "abc"
        strs = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 5)))
            for _ in range(120)
        ] + [None, "way-too-long" * 20]
        t = pa.table(
            {
                "rid": pa.array(list(range(len(strs))), type=pa.int64()),
                "s": pa.array(strs, type=pa.string()),
            }
        )
        got = (
            edit_distance_pairs_ds(
                ray.data.from_arrow(t).repartition(4), "s", "rid",
                max_len=30, num_buckets=8,
            )
            .to_pandas()
            .sort_values(["id_a", "id_b"])
        )
        got_t = sorted(
            (int(r.id_a), int(r.id_b), int(r.ed)) for r in got.itertuples()
        )
        want = self._brute([s if s is None or len(s) <= 30 else None for s in strs])
        assert got_t == want and len(want) > 50

    def test_each_edit_kind(self, ray_session):
        from vald.ops.dedup import edit_distance_pairs_ds

        strs = ["kitten", "kittenx", "kiten", "mitten", "sitting", "kitten"]
        t = pa.table(
            {"rid": pa.array(range(len(strs)), pa.int64()), "s": strs}
        )
        got = edit_distance_pairs_ds(
            ray.data.from_arrow(t), "s", "rid"
        ).to_pandas()
        pairs = {(int(r.id_a), int(r.id_b)): int(r.ed) for r in got.itertuples()}
        assert pairs[(0, 1)] == 1   # insert
        assert pairs[(0, 2)] == 1   # delete
        assert pairs[(0, 3)] == 1   # substitute
        assert pairs[(0, 5)] == 0   # exact duplicate
        assert (0, 4) not in pairs  # ed 3
        # transitivity is NOT implied: kittenx-kiten is ed 2
        assert (1, 2) not in pairs

    def test_low_entropy_refusal(self, ray_session):
        import pytest as _pytest

        from vald.ops.dedup import edit_distance_pairs_ds

        t = pa.table(
            {
                "rid": pa.array(range(50), pa.int64()),
                "s": pa.array(["same"] * 50),
            }
        )
        with _pytest.raises(Exception, match="max_key_group"):
            edit_distance_pairs_ds(
                ray.data.from_arrow(t), "s", "rid", max_key_group=10
            ).to_pandas()


class TestLshParams:
    def test_scurve_midpoint_near_threshold(self):
        from vald.ops.dedup import lsh_params_for_threshold

        for t in (0.3, 0.5, 0.7, 0.9):
            b, r = lsh_params_for_threshold(t, 128)
            assert b * r <= 128 and b >= 1 and r >= 1
            # the 50%-candidate similarity ~ (1/b)^(1/r) must sit near t
            s50 = (1 - 0.5 ** (1 / b)) ** (1 / r)
            assert abs(s50 - t) < 0.12, (t, b, r, s50)

    def test_rows_grow_with_threshold(self):
        from vald.ops.dedup import lsh_params_for_threshold

        rs = [lsh_params_for_threshold(t, 128)[1] for t in (0.2, 0.5, 0.8, 0.95)]
        assert rs == sorted(rs) and rs[0] < rs[-1]

    def test_validation(self):
        import pytest as _pytest

        from vald.ops.dedup import lsh_params_for_threshold

        with _pytest.raises(ValueError):
            lsh_params_for_threshold(0.0)
        with _pytest.raises(ValueError):
            lsh_params_for_threshold(0.5, 1)

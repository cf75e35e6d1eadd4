"""Training-data ops tests: dedup (exact + MinHash + SimHash),
similarity search (brute + IVF recall), text analysis, multimodal
plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from vald.ops import dedup as DD
from vald.ops import multimodal as MM
from vald.ops import similarity as SIM
from vald.ops import text as TX


def _docs(ray_session):
    texts = [
        "the quick brown fox jumps over the lazy dog " * 8,
        "the quick brown fox jumps over the lazy dog " * 8,  # exact dup of 0
        "the quick brown fox jumps over the lazy cat " * 8,  # near dup of 0
        "completely different content about databases and distributed systems " * 6,
        "der schnelle braune fuchs springt und die hunde sind nicht da " * 6,
        "el zorro marron rapido salta sobre el perro perezoso que es muy lento " * 6,
        "le renard brun rapide saute par dessus le chien paresseux dans les bois " * 6,
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    return ray.data.from_arrow(t), texts


def test_exact_dedup_and_distinct(ray_session):
    ds, texts = _docs(ray_session)
    out = DD.exact_dedup(ds, "text", id_col="doc_id").to_pandas()
    assert len(out) == len(set(texts))
    assert 0 in set(out.doc_id) and 1 not in set(out.doc_id)  # keeps min id
    assert DD.distinct_count(ds, "text") == len(set(texts))


def test_minhash_accuracy_vs_exact_jaccard():
    mh = DD.MinHasher(num_perm=256, shingle_k=5)
    a = "the quick brown fox jumps over the lazy dog " * 8
    b = "the quick brown fox jumps over the lazy cat " * 8
    est = float((mh.signature(a) == mh.signature(b)).mean())
    exact = DD.ngram_jaccard(a, b, k=5)
    assert abs(est - exact) < 0.1
    assert float((mh.signature(a) == mh.signature(a)).mean()) == 1.0


def test_minhash_lsh_pipeline(ray_session):
    ds, _ = _docs(ray_session)
    pairs = DD.minhash_dedup_pairs(
        ds, "text", "doc_id", num_perm=64, bands=16, threshold=0.5
    )
    got = set(zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()))
    assert (0, 1) in got  # exact dup found
    assert (0, 2) in got and (1, 2) in got  # near dup found
    assert not any(3 in p for p in got)  # unrelated doc clean
    groups = DD.near_dup_groups(pairs)
    assert groups.get(1) == 0 and groups.get(2) == 0


def test_simhash_pipeline(ray_session):
    ds, _ = _docs(ray_session)
    pairs = DD.simhash_dedup_pairs(ds, "text", "doc_id", max_hamming=6)
    got = set(zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()))
    assert (0, 1) in got
    assert not any(3 in p and (0 in p or 1 in p) for p in got)


def test_knn_brute_matches_numpy(ray_session):
    rng = np.random.default_rng(5)
    emb = rng.standard_normal((200, 16)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": list(range(200)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.reshape(-1), type=pa.float32()), 16
            ),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    q = emb[[3, 77]] + rng.standard_normal((2, 16)).astype(np.float32) * 0.01
    out = SIM.knn_brute(ds, q, k=5).to_pandas()
    # reference: full numpy
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    scores = en @ qn.T
    for qi in (0, 1):
        expect = set(np.argsort(-scores[:, qi])[:5].tolist())
        got = set(out[out.query_id == qi].vec_id)
        assert got == expect
    assert out[out.query_id == 0].iloc[0].vec_id == 3  # nearest is the seed


def test_knn_ivf_recall(ray_session):
    rng = np.random.default_rng(9)
    # clustered data so IVF cells are meaningful
    centers = rng.standard_normal((8, 16)).astype(np.float32) * 4
    emb = np.vstack([c + rng.standard_normal((50, 16)).astype(np.float32) for c in centers])
    t = pa.table(
        {
            "vec_id": list(range(len(emb))),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.reshape(-1), type=pa.float32()), 16
            ),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    idx = SIM.IvfIndex.train(ds, num_cells=8, sample_frac=0.5)
    q = emb[[10, 260]]
    brute = SIM.knn_brute(ds, q, k=10).to_pandas()
    ivf = SIM.knn_ivf(ds, q, idx, k=10, nprobe=3).to_pandas()
    for qi in (0, 1):
        b = set(brute[brute.query_id == qi].vec_id)
        a = set(ivf[ivf.query_id == qi].vec_id)
        assert len(a & b) / len(b) >= 0.8  # recall@10 >= 0.8


def test_pq_recall_and_compression(ray_session):
    """PQ (train → encode → ADC top-k): recall@10 >= 0.7 vs exact L2
    on clustered embeddings, uint8 code shape (dim×4 → m bytes), and
    encode determinism across partitionings."""
    rng = np.random.default_rng(23)
    # 12-point clusters: each query's true top-10 is its cluster, so
    # recall measures PQ's realistic claim — preserving neighborhood
    # structure — not sub-quantization-noise ordering inside one blob
    centers = rng.standard_normal((8, 32)).astype(np.float32) * 6
    emb = np.vstack(
        [c + rng.standard_normal((12, 32)).astype(np.float32) * 0.5 for c in centers]
    )
    t = pa.table(
        {
            "vec_id": list(range(len(emb))),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.reshape(-1), type=pa.float32()), 32
            ),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    books = SIM.pq_train(ds, m=8, k=32, sample_rows=480, iters=8, seed=3)
    assert books.shape == (8, 32, 4) and books.dtype == np.float32

    enc = SIM.pq_encode_ds(ds, books).to_pandas().sort_values("vec_id")
    codes = np.stack(enc["pq_code"].to_numpy())
    assert codes.shape == (len(emb), 8) and codes.dtype == np.uint8
    # determinism across partitionings
    enc2 = (
        SIM.pq_encode_ds(ray.data.from_arrow(t).repartition(7), books)
        .to_pandas()
        .sort_values("vec_id")
    )
    assert (np.stack(enc2["pq_code"].to_numpy()) == codes).all()

    q = emb[[5, 30, 80]]
    got = SIM.pq_topk(
        SIM.pq_encode_ds(ds, books),
        q,
        books,
        k=10,
    ).to_pandas()
    # exact L2 reference
    for qi in range(3):
        d = ((emb - q[qi]) ** 2).sum(axis=1)
        want = set(np.argsort(d)[:10].tolist())
        a = set(got[got.query_id == qi].vec_id)
        assert len(a & want) / 10 >= 0.7, (qi, len(a & want))
    # the query's own seed vector must rank first
    assert got[got.query_id == 0].iloc[0].vec_id == 5


def test_language_id(ray_session):
    ds, _ = _docs(ray_session)
    t = pa.table(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "the cat and the dog are in the house with the mouse",
                "der hund und die katze sind nicht im haus von dem mann",
                "el perro y el gato en la casa es un animal por la noche",
                "这是一个中文测试文档里面有很多汉字用于语言识别",
            ],
        }
    )
    out = TX.language_id(ray.data.from_arrow(t), concurrency=1).to_pandas()
    assert list(out.sort_values("doc_id").lang_pred) == ["en", "de", "es", "zh"]


def test_quality_and_tokens(ray_session):
    t = pa.table(
        {
            "doc_id": [0, 1],
            "text": [
                "The quick brown fox jumps over the lazy dog. " * 15,
                "0101010101 0101010101 0101010101 0101010101",
            ],
        }
    )
    ds = ray.data.from_arrow(t)
    q = TX.quality_scores(ds, concurrency=1).to_pandas().sort_values("doc_id")
    assert q.iloc[0].quality_score > q.iloc[1].quality_score
    tk = TX.token_counts(ds, concurrency=1).to_pandas().sort_values("doc_id")
    assert tk.iloc[0].n_tokens_ws == 9 * 15
    assert tk.iloc[0].n_tokens_bpeish >= tk.iloc[0].n_tokens_ws  # punct splits add
    fp = TX.fingerprints(ds, concurrency=1).to_pandas()
    assert fp.fingerprint.str.len().eq(8 * 16).all()
    # identical text → identical fingerprint
    t2 = pa.table({"doc_id": [0, 1], "text": [t["text"][0].as_py()] * 2})
    fp2 = TX.fingerprints(ray.data.from_arrow(t2), concurrency=1).to_pandas()
    assert fp2.fingerprint.nunique() == 1


def test_multimodal_pipeline(ray_session):
    ds = MM.fake_media_dataset(40, kind="video")
    dec = MM.decode_media(ds, concurrency=1).to_pandas()
    assert dec.decode_error.isna().all()
    assert (dec.height >= 32).all() and "payload" not in dec.columns
    emb = MM.embed_media(MM.fake_media_dataset(10), dim=16, concurrency=1).to_pandas()
    assert len(emb.iloc[0].media_embedding) == 16
    # determinism: same seed → same embedding
    emb2 = MM.embed_media(MM.fake_media_dataset(10), dim=16, concurrency=1).to_pandas()
    assert np.allclose(
        np.stack(emb.sort_values("media_id").media_embedding.values),
        np.stack(emb2.sort_values("media_id").media_embedding.values),
    )
    frames = MM.sample_frames(MM.fake_media_dataset(20, kind="video"), stride=4, concurrency=1).to_pandas()
    assert (frames.frame_idx % 4 == 0).all() and len(frames) > 20 / 2

    # poison pill: corrupt payload → decode_error row, not a crash
    bad = pa.table(
        {
            "media_id": [99],
            "kind": ["image"],
            "payload": [b"NOTAMEDIAFILE"],
            "meta_json": ["{}"],
        }
    )
    out = MM.decode_media(ray.data.from_arrow(bad), concurrency=1).to_pandas()
    assert out.decode_error.notna().all()


def test_near_dup_groups_distributed_matches_union_find(ray_session):
    """Distributed large-star/small-star CC == driver union-find on a
    seeded graph with chains, a star, a clique and random sparse edges
    (VERDICT r1 item 2)."""
    rng = np.random.RandomState(7)
    edges = [(i, i + 1) for i in range(99)]  # long chain (diameter test)
    edges += [(1000, 1000 + i) for i in range(1, 50)]  # star
    edges += [(2000 + i, 2000 + j) for i in range(10) for j in range(i + 1, 10)]
    for _ in range(300):
        a, b = rng.randint(3000, 4000, 2)
        if a != b:
            edges.append((int(a), int(b)))
    t = pa.table(
        {
            "id_a": pa.array([e[0] for e in edges], type=pa.int64()),
            "id_b": pa.array([e[1] for e in edges], type=pa.int64()),
            "jaccard_est": pa.array([1.0] * len(edges)),
        }
    )
    ref = DD.near_dup_groups(t)
    all_nodes = set(t["id_a"].to_pylist()) | set(t["id_b"].to_pylist())
    # driver_threshold=0 forces the distributed star rounds (the
    # planner would otherwise short-circuit this small graph to the
    # union-find fallback, making the parity check vacuous)
    out = DD.near_dup_groups_ds(
        ray.data.from_arrow(t), driver_threshold=0
    ).to_pandas()
    got = dict(zip(out["id"], out["group_id"]))
    assert set(got) == all_nodes
    assert all(got[k] == ref.get(k, k) for k in all_nodes)
    # and the driver-fallback path must agree with both
    out_fb = DD.near_dup_groups_ds(ray.data.from_arrow(t)).to_pandas()
    got_fb = dict(zip(out_fb["id"], out_fb["group_id"]))
    assert got_fb == got


def test_near_dup_groups_ds_from_minhash(ray_session):
    """End-to-end: minhash pair Dataset → distributed groups; the dup
    cluster {0,1,2} lands in one group, doc 3 is untouched."""
    ds, _ = _docs(ray_session)
    pairs = DD.minhash_dedup_pairs_ds(
        ds, "text", "doc_id", num_perm=64, bands=16, threshold=0.5
    )
    out = DD.near_dup_groups_ds(pairs).to_pandas()
    got = dict(zip(out["id"], out["group_id"]))
    assert got.get(0) == 0 and got.get(1) == 0 and got.get(2) == 0
    assert 3 not in got


def test_near_dup_groups_ds_empty(ray_session):
    empty = pa.table(
        {
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
        }
    )
    out = DD.near_dup_groups_ds(ray.data.from_arrow(empty)).to_pandas()
    assert len(out) == 0


def test_minhash_chunked_signature_equals_unchunked():
    """Permutation-axis chunking (bounded transient memory) must not
    change signatures — checked on a 64 KiB document (VERDICT r1 item 6)."""
    mh = DD.MinHasher(num_perm=64, shingle_k=5)
    text = ("abcdefgh" * 8192) + "tail text for entropy 12345"
    sh = DD._shingle_hashes(text, 5)
    with np.errstate(over="ignore"):
        ref = (sh[:, None] * mh.a[None, :] + mh.b[None, :]).min(axis=0)
    assert (mh.signature(text) == ref).all()


def test_exact_dedup_null_and_value_guard(ray_session):
    """Equal-hash runs break on actual values (collision guard) and
    nulls dedupe together (ADVICE r1)."""
    docs = pa.table(
        {
            "doc_id": pa.array(range(10), type=pa.int64()),
            "text": pa.array(["x", "y", "x", "z", "y", "x", "w", None, None, "z"]),
        }
    )
    out = DD.exact_dedup(
        ray.data.from_arrow(docs), "text", id_col="doc_id"
    ).to_pandas()
    assert sorted(out["doc_id"]) == [0, 1, 3, 6, 7]


def _planted_embeddings(n_base=60, dups_per=2, n_noise=300, dim=32, seed=5):
    """Deterministic embedding set: n_base cluster centers, each with
    dups_per noisy copies (cosine ~0.99), plus unrelated noise vectors."""
    rng = np.random.RandomState(seed)
    rows, ids = [], []
    vid = 0
    for _ in range(n_base):
        c = rng.standard_normal(dim)
        c /= np.linalg.norm(c)
        for _ in range(1 + dups_per):
            v = c + 0.02 * rng.standard_normal(dim)
            rows.append(v.astype(np.float32))
            ids.append(vid)
            vid += 1
    for _ in range(n_noise):
        v = rng.standard_normal(dim)
        rows.append((v / np.linalg.norm(v)).astype(np.float32))
        ids.append(vid)
        vid += 1
    emb = pa.array([r.tolist() for r in rows], type=pa.list_(pa.float32()))
    return pa.table({"vec_id": pa.array(ids, type=pa.int64()), "embedding": emb})


def test_embedding_dedup_matches_bruteforce(ray_session):
    """sign-LSH + exact cosine verify == brute-force all-pairs at
    threshold 0.95 on planted clusters (LSH prunes, never decides)."""
    t = _planted_embeddings()
    mat = np.array([list(v) for v in t["embedding"].to_pylist()], dtype=np.float32)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    ia, ib = np.triu_indices(len(mat), k=1)
    hit = sims[ia, ib] >= 0.95
    want = set(zip(ia[hit].tolist(), ib[hit].tolist()))
    assert len(want) > 50  # the plant worked

    pairs = SIM.embedding_dedup_pairs(
        ray.data.from_arrow(t), threshold=0.95, max_hamming=12
    )
    got = set(zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()))
    # exact verification: no false positives ever
    assert got <= want
    # recall: planted dups are ~0.995 cosine, far inside the LSH radius
    assert len(got) / len(want) >= 0.95
    # cosine values are the exact ones
    for a, b, c in zip(
        pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist(), pairs["cosine"].to_pylist()
    ):
        assert abs(c - float(sims[a, b])) < 1e-5


def test_ivf_partitioned_layout(ray_session, tmp_path):
    """Cell-partitioned inverted lists: write once, probe reads only the
    needed cell directories; recall vs brute >= plain knn_ivf recall."""
    import os

    t = _planted_embeddings(n_base=40, dups_per=1, n_noise=200)
    ds = ray.data.from_arrow(t)
    idx = SIM.IvfIndex.train(ds, num_cells=8, embedding_col="embedding", sample_frac=0.5)
    out_dir = str(tmp_path / "ivf")
    SIM.ivf_write_partitioned(ds, idx, out_dir)
    cells = [d for d in os.listdir(out_dir) if d.startswith("cell=")]
    assert len(cells) >= 2  # layout actually partitioned

    q = np.array([list(v) for v in t["embedding"].to_pylist()[:5]], dtype=np.float32)
    brute = SIM.knn_brute(ray.data.from_arrow(t), q, k=5, id_col="vec_id")
    part = SIM.knn_ivf_partitioned(out_dir, q, idx, k=5, nprobe=4, id_col="vec_id")
    hits = 0
    for qi in range(5):
        b = set(brute.filter(pa.compute.equal(brute["query_id"], qi))["vec_id"].to_pylist())
        p = set(part.filter(pa.compute.equal(part["query_id"], qi))["vec_id"].to_pylist())
        hits += len(b & p) / max(1, len(b))
    assert hits / 5 >= 0.8  # recall with nprobe=4 of 8 cells


def test_drop_near_dups_end_to_end(ray_session):
    """Corpus → minhash pairs → distributed groups → filtered corpus:
    group representatives + unpaired rows survive, members drop.
    Both the broadcast and the left_anti paths must agree."""
    ds, texts = _docs(ray_session)
    pairs = DD.minhash_dedup_pairs_ds(
        ds, "text", "doc_id", num_perm=64, bands=16, threshold=0.5
    )
    groups = DD.near_dup_groups_ds(pairs).materialize()
    kept_b = sorted(
        DD.drop_near_dups(ds, "doc_id", groups).to_pandas()["doc_id"].tolist()
    )
    # {0,1,2} is one near-dup cluster with representative 0
    assert 0 in kept_b and 1 not in kept_b and 2 not in kept_b
    assert all(d in kept_b for d in (3, 4, 5, 6))
    kept_j = sorted(
        DD.drop_near_dups(ds, "doc_id", groups, max_broadcast_ids=0)
        .to_pandas()["doc_id"]
        .tolist()
    )
    assert kept_b == kept_j


def test_near_dup_groups_ds_permutation_invariance(ray_session):
    """Edge order and edge direction must not change group assignments
    (determinism at any parallelism — SURVEY §4.3)."""
    rng = np.random.RandomState(3)
    edges = [(i, i + 1) for i in range(0, 40)] + [
        (int(a), int(b))
        for a, b in rng.randint(100, 160, (60, 2))
        if a != b
    ]
    t = pa.table(
        {
            "id_a": pa.array([e[0] for e in edges], type=pa.int64()),
            "id_b": pa.array([e[1] for e in edges], type=pa.int64()),
        }
    )
    # driver_threshold=0: pin the DISTRIBUTED rounds' determinism
    base = DD.near_dup_groups_ds(
        ray.data.from_arrow(t), driver_threshold=0
    ).to_pandas()
    base_m = dict(zip(base["id"], base["group_id"]))
    # permute rows and flip every edge's direction
    perm = rng.permutation(len(edges))
    t2 = pa.table(
        {
            "id_a": pa.array([edges[i][1] for i in perm], type=pa.int64()),
            "id_b": pa.array([edges[i][0] for i in perm], type=pa.int64()),
        }
    )
    out2 = DD.near_dup_groups_ds(
        ray.data.from_arrow(t2), driver_threshold=0
    ).to_pandas()
    m2 = dict(zip(out2["id"], out2["group_id"]))
    assert base_m == m2


def test_curate_corpus_end_to_end(ray_session):
    """Composed curation: language filter -> quality filter -> exact
    dedup -> near-dup drop, with consistent per-stage accounting."""
    from vald.ops.curate import curate_corpus

    texts = [
        "the quick brown fox jumps over the lazy dog and runs away " * 8,  # keep
        "the quick brown fox jumps over the lazy dog and runs away " * 8,  # exact dup
        "the quick brown fox jumps over the lazy cat and runs away " * 8,  # near dup
        "der schnelle braune fuchs springt und die hunde sind nicht da " * 8,  # de
        "the 123456 and 987654 of 13579 to 24680 in 55555 " * 10,  # en but low quality
        "here is a completely different long document about the history of "
        "databases and the systems that were built for them over the years " * 6,
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts})
    ds = ray.data.from_arrow(t)
    out, rep = curate_corpus(
        ds,
        keep_langs={"en"},
        min_quality=0.7,
        exact_dedup_on="text",
        near_dup_threshold=0.5,
    )
    kept = sorted(out.to_pandas()["doc_id"].tolist())
    assert rep.n_input == 6
    assert rep.n_after_lang == 5          # german doc dropped
    assert rep.n_after_quality == 4       # digit-heavy doc dropped
    assert rep.n_after_exact_dedup == 3   # doc 1 (exact dup of 0) dropped
    assert rep.n_after_near_dedup == 2    # doc 2 (near dup of 0) dropped
    assert kept == [0, 5]
    assert rep.to_table().num_rows == 5
    # schema untouched by the feature stages
    assert set(out.schema().names) == {"doc_id", "text"}


def test_curate_corpus_spill_and_resume(ray_session, tmp_path):
    """spill_dir mode (VERDICT r2 item 4): survivors + groups written to
    parquet instead of object-store materialize, identical results, and
    a re-run with the same spill_dir resumes mid-chain (filter stages
    skipped, spilled artifacts reused)."""
    from vald.ops.curate import curate_corpus

    texts = [
        "the quick brown fox jumps over the lazy dog and runs away " * 8,
        "the quick brown fox jumps over the lazy dog and runs away " * 8,
        "the quick brown fox jumps over the lazy cat and runs away " * 8,
        "der schnelle braune fuchs springt und die hunde sind nicht da " * 8,
        "the 123456 and 987654 of 13579 to 24680 in 55555 " * 10,
        "here is a completely different long document about the history of "
        "databases and the systems that were built for them over the years " * 6,
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts})
    kwargs = dict(
        keep_langs={"en"}, min_quality=0.7, exact_dedup_on="text",
        near_dup_threshold=0.5,
    )
    spill = str(tmp_path / "spill")

    out_mem, rep_mem = curate_corpus(ray.data.from_arrow(t), **kwargs)
    out_sp, rep_sp = curate_corpus(
        ray.data.from_arrow(t), spill_dir=spill, **kwargs
    )
    assert sorted(out_sp.to_pandas()["doc_id"]) == sorted(
        out_mem.to_pandas()["doc_id"]
    ) == [0, 5]
    assert rep_sp.to_table().equals(rep_mem.to_table())
    # spilled artifacts + manifests on disk
    import os
    assert os.path.isdir(os.path.join(spill, "survivors"))
    assert os.path.isdir(os.path.join(spill, "groups"))
    assert os.path.isfile(os.path.join(spill, "_checkpoints", "survivors.json"))
    assert os.path.isfile(os.path.join(spill, "_checkpoints", "groups.json"))

    # resume: a poisoned input proves the filter stages are NOT re-run —
    # everything comes from the spill
    poisoned = ray.data.from_arrow(t.slice(0, 1))
    out_res, rep_res = curate_corpus(poisoned, spill_dir=spill, **kwargs)
    assert sorted(out_res.to_pandas()["doc_id"]) == [0, 5]
    assert rep_res.to_table().equals(rep_mem.to_table())


# ---------------------------------------------------------------------------
# line-level dedup (CCNet/RefinedWeb boilerplate removal)
# ---------------------------------------------------------------------------


class TestLineDedup:
    def _docs(self):
        return pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                "text": [
                    "keep1\nboiler\nkeep2",
                    "boiler\nother",
                    "boiler\nuniq\nboiler",
                    None,
                    "boiler",
                ],
            }
        )

    def test_broadcast_and_join_paths_agree(self, ray_session):
        from vald.ops.dedup import line_dedup_ds

        ds = ray.data.from_arrow(self._docs())
        a = (
            line_dedup_ds(ds, "text", "doc_id", min_df=2)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            line_dedup_ds(ds, "text", "doc_id", min_df=2, max_broadcast_lines=0)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert a.equals(b)
        # 'boiler' df=4 (distinct docs 1,2,3,5) -> removed everywhere,
        # BOTH occurrences in doc 3; null-text doc 4 dropped
        assert a["doc_id"].tolist() == [1, 2, 3, 5]
        assert a["n_lines"].tolist() == [3, 2, 3, 1]
        assert a["n_removed"].tolist() == [1, 1, 2, 1]
        assert a["text"].tolist() == ["keep1\nkeep2", "other", "uniq", ""]

    def test_doc_frequency_is_distinct_docs(self, ray_session):
        # a line repeated many times INSIDE one doc must not reach min_df
        from vald.ops.dedup import line_dedup_ds

        t = pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": ["x\nx\nx\nx", "y"],
            }
        )
        out = (
            line_dedup_ds(ray.data.from_arrow(t), "text", "doc_id", min_df=2)
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out["n_removed"].tolist() == [0, 0]

    def test_empty_corpus(self, ray_session):
        from vald.ops.dedup import line_dedup_ds

        t = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "text": pa.array([], type=pa.string()),
            }
        )
        out = line_dedup_ds(ray.data.from_arrow(t), "text", "doc_id").to_pandas()
        assert len(out) == 0


class TestRepetitionStats:
    def test_counts_and_null_rows(self, ray_session):
        from vald.ops.text import repetition_stats

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": ["a a b", None, ""],
            }
        )
        out = (
            repetition_stats(ray.data.from_arrow(t), "text", "doc_id")
            .to_pandas()
            .sort_values("doc_id")
        )
        # whitespace-run tokenizer: "" -> 0 tokens; null row dropped
        assert out["doc_id"].tolist() == [1, 3]
        assert out["n_tokens"].tolist() == [3, 0]
        assert out["n_distinct"].tolist() == [2, 0]

    def test_literal_delimiter_keeps_empty_tokens(self, ray_session):
        from vald.ops.text import repetition_stats

        t = pa.table(
            {"doc_id": pa.array([1], type=pa.int64()), "text": ["a  a"]}
        )
        out = repetition_stats(
            ray.data.from_arrow(t), "text", "doc_id", delimiter=" "
        ).to_pandas()
        # 'a', '', 'a' — matches SQL string_split semantics
        assert out["n_tokens"].tolist() == [3]
        assert out["n_distinct"].tolist() == [2]


class TestDupSpans:
    def _docs(self):
        return pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                "text": [
                    "the cat sat on the mat",
                    "a cat sat on the rug",
                    "the cat sat on the mat too",
                    None,
                    "tiny doc",  # < width tokens: zero windows, omitted
                ],
            }
        )

    def _brute(self, width=4, min_df=2):
        texts = {1: "the cat sat on the mat", 2: "a cat sat on the rug",
                 3: "the cat sat on the mat too", 5: "tiny doc"}
        df = {}
        wins = {}
        for d, tx in texts.items():
            tk = tx.split()
            wins[d] = [" ".join(tk[i:i + width]) for i in range(len(tk) - width + 1)]
            for w in set(wins[d]):
                df[w] = df.get(w, 0) + 1
        freq = {w for w, c in df.items() if c >= min_df}
        return {
            d: (len(ws), sum(w in freq for w in ws))
            for d, ws in wins.items()
            if len(ws) > 0
        }

    @pytest.mark.parametrize("broadcast", [2_000_000, 0])
    def test_matches_bruteforce_both_paths(self, ray_session, broadcast):
        from vald.ops.dedup import dup_span_stats_ds

        out = (
            dup_span_stats_ds(
                ray.data.from_arrow(self._docs()),
                "text",
                "doc_id",
                width=4,
                min_df=2,
                max_broadcast_grams=broadcast,
            )
            .to_pandas()
            .sort_values("doc_id")
        )
        ref = self._brute()
        assert out["doc_id"].tolist() == sorted(ref)
        for _, r in out.iterrows():
            nw, nd = ref[r["doc_id"]]
            assert (r["n_windows"], r["n_dup_windows"]) == (nw, nd)


class TestPackSequences:
    def test_invariants_and_determinism(self, ray_session):
        from vald.ops.pack import pack_sequences

        rng = np.random.default_rng(5)
        n = 500
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(n), type=pa.int64()),
                "n_chars": pa.array(
                    rng.integers(1, 900, n), type=pa.int64()
                ),
            }
        )
        ds = ray.data.from_arrow(t)
        a = (
            pack_sequences(ds, "doc_id", "n_chars", cap=2000, num_buckets=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            pack_sequences(ds, "doc_id", "n_chars", cap=2000, num_buckets=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert a.equals(b)  # deterministic at fixed bucket count
        assert sorted(a["doc_id"]) == list(range(n))  # every doc exactly once
        sums = a.groupby("pack_id")["n_chars"].sum()
        sizes = a.groupby("pack_id")["doc_id"].count()
        # capacity: multi-doc packs never exceed cap
        assert (sums[sizes > 1] <= 2000).all()
        # pack_pos is 0..k-1 within each pack
        assert (
            a.sort_values(["pack_id", "pack_pos"])
            .groupby("pack_id")["pack_pos"]
            .apply(lambda s: s.tolist() == list(range(len(s))))
            .all()
        )

    def test_oversized_doc_gets_own_pack(self, ray_session):
        from vald.ops.pack import pack_sequences

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "n_chars": pa.array([5000, 10, 10], type=pa.int64()),
            }
        )
        out = (
            pack_sequences(
                ray.data.from_arrow(t), "doc_id", "n_chars", cap=100, num_buckets=1
            )
            .to_pandas()
            .sort_values("doc_id")
        )
        big_pack = out[out.doc_id == 1]["pack_id"].iloc[0]
        assert (out[out.pack_id == big_pack]["doc_id"] == 1).all()


# ---------------------------------------------------------------------------
# decontamination (ops.decontam)
# ---------------------------------------------------------------------------


class TestDecontam:
    WIDTH = 3

    @staticmethod
    def _brute_grams(text: str, width: int) -> set[str]:
        toks = text.split()
        return {
            " ".join(toks[i : i + width])
            for i in range(max(len(toks) - width + 1, 0))
        }

    def _corpus(self):
        texts = [
            "alpha beta gamma delta epsilon zeta",          # eval doc
            "zzz alpha beta gamma yyy xxx",                  # overlaps eval
            "one two three four five six seven",             # clean
            "delta epsilon zeta eta theta",                  # overlaps eval
            "short txt",                                     # < width tokens
            None,                                            # NULL text
            "unrelated words entirely here today",           # clean
        ]
        t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
        return ray.data.from_arrow(t), texts

    def test_stats_matches_bruteforce(self, ray_session):
        from vald.ops.decontam import decontaminate

        ds, texts = self._corpus()
        eval_ds = ray.data.from_arrow(
            pa.table({"doc_id": [0], "text": [texts[0]]})
        )
        out = (
            decontaminate(ds, eval_ds, "text", "doc_id", width=self.WIDTH)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        eval_grams = self._brute_grams(texts[0], self.WIDTH)
        for i, txt in enumerate(texts):
            if txt is None:
                assert i not in out.index
                continue
            toks = txt.split()
            nw = max(len(toks) - self.WIDTH + 1, 0)
            if nw == 0:
                assert i not in out.index
                continue
            hits = sum(
                1
                for j in range(nw)
                if " ".join(toks[j : j + self.WIDTH]) in eval_grams
            )
            assert out.loc[i, "n_windows"] == nw
            assert out.loc[i, "n_eval_windows"] == hits, f"doc {i}"

    def test_filter_drops_contaminated_keeps_rest(self, ray_session):
        from vald.ops.decontam import decontaminate

        ds, texts = self._corpus()
        eval_ds = ray.data.from_arrow(
            pa.table({"doc_id": [0], "text": [texts[0]]})
        )
        kept = set(
            decontaminate(
                ds, eval_ds, "text", "doc_id", width=self.WIDTH, mode="filter"
            )
            .to_pandas()["doc_id"]
            .dropna()
        )
        # contaminated: 0 (the eval doc itself), 1, 3; the NULL-text row
        # (5) and the too-short doc (4) cannot be contaminated → kept
        assert kept == {2, 4, 5, 6}

    def test_empty_eval_set_flags_nothing(self, ray_session):
        from vald.ops.decontam import decontaminate

        ds, texts = self._corpus()
        eval_ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "text": pa.array([], type=pa.string()),
                }
            )
        )
        out = decontaminate(
            ds, eval_ds, "text", "doc_id", width=self.WIDTH
        ).to_pandas()
        assert (out["n_eval_windows"] == 0).all()
        n_docs = sum(
            1
            for x in texts
            if x is not None and len(x.split()) >= self.WIDTH
        )
        assert len(out) == n_docs

    def test_eval_gram_bound_enforced(self, ray_session):
        from vald.ops.decontam import decontaminate

        ds, texts = self._corpus()
        eval_ds = ray.data.from_arrow(
            pa.table({"doc_id": [0], "text": [texts[0]]})
        )
        with pytest.raises(ValueError, match="max_eval_grams"):
            decontaminate(
                ds, eval_ds, "text", "doc_id", width=self.WIDTH,
                max_eval_grams=1,
            )

    @pytest.mark.parametrize("method", ["hashed", "bloom"])
    def test_approx_methods_match_exact(self, ray_session, method):
        # on a small corpus the hashed and (well-sized) bloom paths must
        # reproduce the exact stats bit-for-bit — collisions/FPR are
        # astronomically unlikely at this n
        from vald.ops.decontam import decontaminate

        ds, texts = self._corpus()
        eval_ds = ray.data.from_arrow(
            pa.table({"doc_id": [0], "text": [texts[0]]})
        )
        exact = (
            decontaminate(ds, eval_ds, "text", "doc_id", width=self.WIDTH)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        approx = (
            decontaminate(
                ds, eval_ds, "text", "doc_id", width=self.WIDTH, method=method
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(exact, approx)

    def test_bloom_false_positives_only_overcount(self, ray_session):
        # an undersized bloom (2 bits/key) may FLAG extra windows but
        # must never report fewer than exact — one-sided error
        from vald.ops.decontam import decontaminate

        ds, texts = self._corpus()
        eval_ds = ray.data.from_arrow(
            pa.table({"doc_id": [0], "text": [texts[0]]})
        )
        exact = (
            decontaminate(ds, eval_ds, "text", "doc_id", width=self.WIDTH)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        tiny = (
            decontaminate(
                ds, eval_ds, "text", "doc_id", width=self.WIDTH,
                method="bloom", bits_per_key=2,
            )
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert (tiny["n_windows"] == exact["n_windows"]).all()
        assert (tiny["n_eval_windows"] >= exact["n_eval_windows"]).all()

    def test_bloom_filter_unit(self, ray_session):
        from vald.ops.decontam import BloomFilter

        rng = np.random.RandomState(7)
        members = rng.randint(0, 2**63, size=5000).astype(np.uint64)
        probes = rng.randint(0, 2**63, size=20000).astype(np.uint64)
        bf = BloomFilter(members, bits_per_key=16)
        assert bf.contains(members).all()  # no false negatives, ever
        fp = bf.contains(np.setdiff1d(probes, members)).mean()
        assert fp < 0.01  # ~4e-4 expected at 16 bits/key
        empty = BloomFilter(np.empty(0, dtype=np.uint64))
        assert not empty.contains(probes).any()
        assert len(empty.contains(np.empty(0, dtype=np.uint64))) == 0


# ---------------------------------------------------------------------------
# PII detection / scrubbing (ops.text.regex_stats / scrub_text)
# ---------------------------------------------------------------------------


class TestPii:
    def _corpus(self):
        texts = [
            "reach me at alice.smith+dev@example.co.uk or bob@x.io thanks",
            "server 192.168.0.1 and 10.0.0.255 are up",
            "call +1 555-123-4567 today; ssn 123-45-6789 on file",
            "no pii at all in this document",
            None,
        ]
        t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
        return ray.data.from_arrow(t)

    def test_preset_counts(self, ray_session):
        out = (
            TX.regex_stats(self._corpus(), "text", "doc_id")
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert list(out.loc[0, ["n_email", "n_ipv4", "n_phone", "n_ssn"]]) == [2, 0, 0, 0]
        assert out.loc[1, "n_ipv4"] == 2
        assert out.loc[2, "n_phone"] == 1 and out.loc[2, "n_ssn"] == 1
        assert out.loc[3].sum() == 0
        assert out.loc[4].sum() == 0  # NULL text counts as zero hits

    def test_scrub_redacts_and_preserves_null(self, ray_session):
        out = (
            TX.scrub_text(self._corpus(), "text")
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert "<EMAIL>" in out.loc[0, "text"] and "@" not in out.loc[0, "text"]
        assert "<IPV4>" in out.loc[1, "text"] and "192.168" not in out.loc[1, "text"]
        assert "<PHONE>" in out.loc[2, "text"] and "<SSN>" in out.loc[2, "text"]
        assert out.loc[3, "text"] == "no pii at all in this document"
        assert out.loc[4, "text"] is None or out.loc[4, "text"] != out.loc[4, "text"]

    def test_scrub_out_col_and_single_replacement(self, ray_session):
        out = (
            TX.scrub_text(
                self._corpus(), "text",
                {"email": TX.PII_PATTERNS["email"]},
                replacement="[X]", out_col="clean",
            )
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert "[X]" in out.loc[0, "clean"]
        # original column untouched when scrubbing into out_col
        assert "@" in out.loc[0, "text"]


# ---------------------------------------------------------------------------
# document chunking (ops.text.split_documents)
# ---------------------------------------------------------------------------


class TestSplitDocuments:
    def _brute(self, texts, max_tokens, overlap):
        stride = max_tokens - overlap
        rows = []
        for i, txt in enumerate(texts):
            if txt is None:
                continue
            toks = txt.split()
            w = 0
            while w * stride < len(toks):
                c = toks[w * stride : w * stride + max_tokens]
                rows.append((i, w, " ".join(c), len(c)))
                w += 1
        return sorted(rows)

    @pytest.mark.parametrize("max_tokens,overlap", [(4, 0), (4, 3), (5, 2), (100, 10)])
    def test_matches_bruteforce(self, ray_session, max_tokens, overlap):
        texts = [
            "t1 t2 t3 t4 t5 t6 t7 t8 t9",
            "one",
            None,
            "   ",
            "a b c d",          # exactly max_tokens for (4, *)
            "w " * 23,          # long doc, trailing space
        ]
        t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
        out = (
            TX.split_documents(
                ray.data.from_arrow(t), "text", "doc_id",
                max_tokens=max_tokens, overlap=overlap,
            )
            .to_pandas()
            .sort_values(["doc_id", "chunk_id"])
        )
        got = sorted(
            (int(r.doc_id), int(r.chunk_id), r.chunk, int(r.n_tokens))
            for r in out.itertuples()
        )
        assert got == self._brute(texts, max_tokens, overlap)

    def test_coverage_reconstructs_doc(self, ray_session):
        # overlap=0 chunks concatenate back to the original token stream
        txt = " ".join(f"tok{i}" for i in range(57))
        t = pa.table({"doc_id": [0], "text": [txt]})
        out = (
            TX.split_documents(
                ray.data.from_arrow(t), "text", "doc_id",
                max_tokens=10, overlap=0,
            )
            .to_pandas()
            .sort_values("chunk_id")
        )
        assert " ".join(out["chunk"]) == txt
        assert out["n_tokens"].sum() == 57

    def test_bad_overlap_rejected(self, ray_session):
        t = pa.table({"doc_id": [0], "text": ["a b"]})
        with pytest.raises(ValueError):
            TX.split_documents(
                ray.data.from_arrow(t), max_tokens=4, overlap=4
            )


# ---------------------------------------------------------------------------
# deterministic global shuffle (ops.shuffle.hash_shuffle)
# ---------------------------------------------------------------------------


class TestHashShuffle:
    def test_order_matches_hash_sort(self, ray_session):
        from vald.ops.shuffle import hash_shuffle, shuffle_hash

        ids = np.array([5, 1, 9, 3, 7, 2, 8, 0, 6, 4], dtype=np.int64)
        t = pa.table({"k": ids, "payload": [f"p{i}" for i in ids]})
        out = hash_shuffle(ray.data.from_arrow(t), "k").to_pandas()
        h = shuffle_hash(ids)
        expect = ids[np.lexsort((ids, h))]
        assert out["k"].tolist() == expect.tolist()
        # payload rides along
        assert out["payload"].tolist() == [f"p{i}" for i in expect]

    def test_deterministic_and_salted(self, ray_session):
        from vald.ops.shuffle import hash_shuffle

        t = pa.table({"k": list(range(200))})
        a = hash_shuffle(ray.data.from_arrow(t), "k").to_pandas()["k"].tolist()
        b = hash_shuffle(ray.data.from_arrow(t), "k").to_pandas()["k"].tolist()
        assert a == b  # same run-to-run order
        c = hash_shuffle(
            ray.data.from_arrow(t), "k", salt=1
        ).to_pandas()["k"].tolist()
        assert sorted(c) == sorted(a) and c != a  # epoch re-salt permutes

    def test_null_keys_dropped(self, ray_session):
        from vald.ops.shuffle import hash_shuffle

        t = pa.table({"k": pa.array([1, None, 2], type=pa.int64())})
        out = hash_shuffle(ray.data.from_arrow(t), "k").to_pandas()
        assert sorted(out["k"].tolist()) == [1, 2]


# ---------------------------------------------------------------------------
# per-group z-score normalization (ops.stats.group_zscore)
# ---------------------------------------------------------------------------


class TestGroupZscore:
    def test_matches_pandas(self, ray_session):
        import pandas as pd

        from vald.ops.stats import group_zscore

        rng = np.random.default_rng(7)
        n = 1000
        df = pd.DataFrame(
            {
                "g": rng.choice(["a", "b", "c"], n),
                "v": rng.normal(50, 20, n),
            }
        )
        out = (
            group_zscore(
                ray.data.from_arrow(pa.Table.from_pandas(df)), "g", "v"
            )
            .to_pandas()
            .sort_index()
        )
        mean = df.groupby("g")["v"].transform("mean")
        std = df.groupby("g")["v"].transform(lambda s: s.std(ddof=0))
        expect = (df["v"] - mean) / std
        got = out.sort_values("v").reset_index(drop=True)["z"]
        want = (
            pd.DataFrame({"v": df["v"], "z": expect})
            .sort_values("v")
            .reset_index(drop=True)["z"]
        )
        assert np.allclose(got, want, atol=1e-9)

    def test_nan_null_and_zero_variance(self, ray_session):
        from vald.ops.stats import group_zscore

        t = pa.table(
            {
                "g": ["a", "a", "a", "b", "b", None],
                "v": pa.array(
                    [1.0, 2.0, None, 5.0, 5.0, 1.0], type=pa.float64()
                ),
            }
        )
        out = group_zscore(ray.data.from_arrow(t), "g", "v").to_pandas()
        # null value + null group dropped
        assert len(out) == 4
        # zero-variance group -> NULL z
        bz = out[out["g"] == "b"]["z"]
        assert bz.isna().all()


# ---------------------------------------------------------------------------
# DSIR-style importance weighting (ops.importance)
# ---------------------------------------------------------------------------


class TestImportance:
    def test_matches_bruteforce(self, ray_session):
        import pandas as pd

        from vald.ops.importance import importance_weights

        corpus = [
            "machine learning models train on curated data sets",
            "the cat sat on the mat and the dog sat too",
            "distributed systems process large data sets with care",
            "poetry about cats and dogs sitting on mats",
            None,
            "one",  # fewer tokens than a bigram -> NULL score
        ]
        target = [
            "machine learning needs curated data",
            "distributed data processing systems",
        ]
        B, W = 1 << 12, 2
        t = pa.table({"doc_id": list(range(len(corpus))), "text": corpus})
        out = (
            importance_weights(
                ray.data.from_arrow(t),
                target,
                width=W,
                num_features=B,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

        # brute force with the same stable hash
        def grams(s):
            tk = s.split()
            return [" ".join(tk[i : i + W]) for i in range(len(tk) - W + 1)]

        def fid(g):
            # int() BEFORE the modulo: np.uint64 % python-int promotes
            # to float64 and silently loses precision
            return int(
                pd.util.hash_array(
                    np.array([g], dtype=object), categorize=False
                )[0]
            ) % B

        tgt = np.zeros(B)
        for s in target:
            for g in grams(s):
                tgt[fid(g)] += 1
        bg = np.zeros(B)
        for s in corpus:
            if s is None:
                continue
            for g in grams(s):
                bg[fid(g)] += 1
        ratio = (
            np.log(tgt + 1)
            - np.log(tgt.sum() + B)
            - np.log(bg + 1)
            + np.log(bg.sum() + B)
        )
        for i, s in enumerate(corpus):
            row = out.iloc[i]
            gs = grams(s) if s else []
            if len(gs) == 0:
                assert row["n_grams"] == 0 and np.isnan(row["score"])
            else:
                want = float(np.mean([ratio[fid(g)] for g in gs]))
                assert row["n_grams"] == len(gs)
                assert abs(row["score"] - want) < 1e-9, (i, row["score"], want)

    def test_target_like_docs_score_higher(self, ray_session):
        from vald.ops.importance import importance_weights

        corpus = [
            "alpha beta gamma delta " * 5,
            "omega psi chi phi " * 5,
        ]
        target = ["alpha beta gamma delta"]
        t = pa.table({"doc_id": [0, 1], "text": corpus})
        out = (
            importance_weights(ray.data.from_arrow(t), target)
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out["score"].iloc[0] > out["score"].iloc[1]


# ---------------------------------------------------------------------------
# TF-IDF (ops.text.tfidf_ds) and pivoted counts (ops.stats.pivot_counts)
# ---------------------------------------------------------------------------


class TestTfidf:
    def test_matches_bruteforce(self, ray_session):
        import math
        from collections import Counter

        corpus = [
            "a b b c",
            "b c c d",
            None,
            "",
            "a a a a",
        ]
        t = pa.table({"doc_id": list(range(len(corpus))), "text": corpus})
        out = (
            TX.tfidf_ds(ray.data.from_arrow(t), "text", "doc_id")
            .to_pandas()
            .sort_values(["doc_id", "term"])
            .reset_index(drop=True)
        )
        # brute force: N counts docs with non-null text (empty included)
        docs = {i: s.split() for i, s in enumerate(corpus) if s is not None}
        N = len(docs)
        df = Counter()
        for toks in docs.values():
            for term in set(toks):
                df[term] += 1
        want = []
        for i, toks in docs.items():
            for term, tf in sorted(Counter(toks).items()):
                want.append(
                    (i, term, tf, df[term], tf * math.log(N / df[term]))
                )
        got = [
            (int(r.doc_id), r.term, int(r.tf), int(r.df), float(r.tfidf))
            for r in out.itertuples()
        ]
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g[:4] == w[:4]
            assert abs(g[4] - w[4]) < 1e-12

    def test_term_join_parity(self, ray_session):
        # VERDICT r4 item 1: above max_broadcast_terms the op must no
        # longer refuse — it routes scoring through a hash-partitioned
        # term join whose output byte-agrees with the broadcast path
        # (the same forced-low-threshold discipline as
        # test_broadcast_guard). The vocab size check happens on a
        # DISTRIBUTED count, never a driver pull.
        import pandas as pd

        corpus = ["a b b c", "b c c d", None, "", "a a a a", "   "]
        t = pa.table({"doc_id": list(range(len(corpus))), "text": corpus})
        ds = ray.data.from_arrow(t).repartition(3)

        def norm(df):
            return df.sort_values(["doc_id", "term"]).reset_index(drop=True)

        a = norm(TX.tfidf_ds(ds, "text", "doc_id").to_pandas())
        b = norm(
            TX.tfidf_ds(
                ds, "text", "doc_id", max_broadcast_terms=0
            ).to_pandas()
        )
        assert len(a) > 0
        pd.testing.assert_frame_equal(a, b[a.columns])

    def test_whitespace_only_rows_never_token(self, ray_session):
        # pyarrow 16.1's split kernels read past the data buffer into
        # its padding, which object-store blocks don't zero: pre-fix,
        # a whitespace-only row nondeterministically produced a phantom
        # ' ' term (~20% of runs). compact_strings() re-materializes
        # the column first; several runs catch a regression w.h.p.
        import math

        t = pa.table(
            {
                "doc_id": pa.array(range(2), pa.int64()),
                "text": pa.array(["cat cat dog runs", "   "]),
            }
        )
        want = math.log(2 / 4) * 0.5 + math.log(1 / 4) * 0.5  # cat,cat,dog,runs
        for _ in range(5):
            out = (
                TX.unigram_logprob_ds(
                    ray.data.from_arrow(t).repartition(1), "text", "doc_id"
                )
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )
            assert out["n_tokens"].tolist() == [4, 0]
            assert abs(out.loc[0, "logprob"] - want) < 1e-12


class TestBM25:
    def test_matches_bruteforce(self, ray_session):
        import math
        from collections import Counter

        corpus = [
            "hash join beats sort merge join",
            "scan scan scan",
            None,
            "",
            "nothing relevant here",
            "hash",
        ]
        Q = ["hash", "join", "scan"]
        k1, b = 1.2, 0.75
        t = pa.table({"doc_id": list(range(len(corpus))), "text": corpus})
        out = (
            TX.bm25_ds(
                ray.data.from_arrow(t).repartition(3), "text", "doc_id", Q
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        docs = {i: s.split() for i, s in enumerate(corpus) if s is not None}
        N = len(docs)
        total = sum(len(v) for v in docs.values())
        avgdl = total / N
        df = Counter()
        for toks in docs.values():
            for q in set(toks) & set(Q):
                df[q] += 1
        assert out["doc_id"].tolist() == sorted(docs)
        for r in out.itertuples():
            toks = docs[r.doc_id]
            assert r.n_tokens == len(toks)
            tf = Counter(tok for tok in toks if tok in Q)
            want = sum(
                math.log((N - df[q] + 0.5) / (df[q] + 0.5) + 1)
                * tf[q] * (k1 + 1) / (tf[q] + k1 * (1 - b + b * len(toks) / avgdl))
                for q in tf
            )
            assert abs(r.bm25 - want) < 1e-12, (r.doc_id, r.bm25, want)
        # ranking sanity: the all-scan doc tops 'nothing relevant'
        scores = dict(zip(out["doc_id"], out["bm25"]))
        assert scores[1] > scores[4] == 0.0

    def test_empty_query_rejected(self, ray_session):
        t = pa.table({"doc_id": [0], "text": ["a"]})
        with pytest.raises(ValueError):
            TX.bm25_ds(ray.data.from_arrow(t), "text", "doc_id", [])


class TestCategoricalEntropy:
    def test_matches_bruteforce(self, ray_session):
        import math
        from collections import Counter

        from vald.ops.stats import categorical_entropy_ds

        rng = np.random.default_rng(5)
        a = rng.choice(["x", "y", "z", "w"], 400, p=[0.7, 0.2, 0.05, 0.05])
        b = ["const"] * 400
        t = pa.table(
            {
                "a": pa.array(a.tolist() + [None] * 10, type=pa.string()),
                "b": pa.array(b + [None] * 10, type=pa.string()),
            }
        )
        out = (
            categorical_entropy_ds(
                ray.data.from_arrow(t).repartition(4), ["a", "b"]
            )
            .to_pandas()
            .set_index("column")
        )
        cnt = Counter(a.tolist())
        T = sum(cnt.values())
        want = -sum(n / T * math.log(n / T) for n in cnt.values())
        assert out.loc["a", "n"] == 400 and out.loc["a", "n_distinct"] == 4
        assert abs(out.loc["a", "entropy"] - want) < 1e-9
        # constant column: zero entropy, NULLs excluded from n
        assert out.loc["b", "n"] == 400 and out.loc["b", "n_distinct"] == 1
        assert out.loc["b", "entropy"] == 0.0

    def test_uniform_is_ln_k(self, ray_session):
        import math

        from vald.ops.stats import categorical_entropy_ds

        t = pa.table({"c": pa.array([str(i % 8) for i in range(800)])})
        out = categorical_entropy_ds(ray.data.from_arrow(t), ["c"]).to_pandas()
        assert abs(out.loc[0, "entropy"] - math.log(8)) < 1e-9


class TestPivotCounts:
    def test_matches_bruteforce(self, ray_session):
        import pandas as pd

        from vald.ops.stats import pivot_counts

        rng = np.random.default_rng(3)
        df = pd.DataFrame(
            {
                "k": rng.integers(0, 20, 500),
                "c": rng.choice(["x", "y", "z"], 500),
            }
        )
        # inject a NULL key and a NULL category
        df.loc[0, "k"] = None
        df.loc[1, "c"] = None
        t = pa.Table.from_pandas(df, preserve_index=False)
        out = (
            pivot_counts(ray.data.from_arrow(t), "k", "c")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        clean = df.dropna(subset=["k"])
        want = (
            pd.crosstab(clean["k"], clean["c"])
            .reindex(columns=["x", "y", "z"], fill_value=0)
            .reset_index()
        )
        want.columns = ["k", "n_x", "n_y", "n_z"]
        want = want.sort_values("k").reset_index(drop=True)
        assert out["k"].tolist() == want["k"].tolist()
        for c in ["n_x", "n_y", "n_z"]:
            assert out[c].tolist() == want[c].tolist()

    def test_explicit_categories(self, ray_session):
        from vald.ops.stats import pivot_counts

        t = pa.table({"k": [1, 1, 2], "c": ["a", "b", "a"]})
        out = (
            pivot_counts(
                ray.data.from_arrow(t), "k", "c", categories=["a", "missing"]
            )
            .to_pandas()
            .sort_values("k")
        )
        assert out["n_a"].tolist() == [1, 1]
        assert out["n_missing"].tolist() == [0, 0]


# ---------------------------------------------------------------------------
# unigram-LM log-prob quality score (ops.text.unigram_logprob_ds)
# ---------------------------------------------------------------------------


class TestUnigramLogprob:
    def test_matches_bruteforce(self, ray_session):
        import math
        from collections import Counter

        corpus = ["a b b", "b c", None, "", "a"]
        t = pa.table({"doc_id": list(range(len(corpus))), "text": corpus})
        out = (
            TX.unigram_logprob_ds(ray.data.from_arrow(t), "text", "doc_id")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        lm = Counter(tok for s in corpus if s for tok in s.split())
        total = sum(lm.values())
        # NULL text dropped; empty text scored with n_tokens=0, NULL lp
        assert out["doc_id"].tolist() == [0, 1, 3, 4]
        for r in out.itertuples():
            s = corpus[r.doc_id]
            toks = s.split()
            assert r.n_tokens == len(toks)
            if not toks:
                assert np.isnan(r.logprob)
            else:
                want = sum(math.log(lm[x] / total) for x in toks) / len(toks)
                assert abs(r.logprob - want) < 1e-12

    def test_term_join_parity(self, ray_session):
        # forced join route (threshold 0) must reproduce the broadcast
        # result exactly, including the zero-token doc row that rides a
        # NULL-term anchor through the left-outer join
        import pandas as pd

        corpus = ["a b b", "b c", None, "", "a", "   "]
        t = pa.table({"doc_id": list(range(len(corpus))), "text": corpus})
        ds = ray.data.from_arrow(t).repartition(3)

        def norm(df):
            return df.sort_values("doc_id").reset_index(drop=True)

        a = norm(TX.unigram_logprob_ds(ds, "text", "doc_id").to_pandas())
        b = norm(
            TX.unigram_logprob_ds(
                ds, "text", "doc_id", max_broadcast_terms=0
            ).to_pandas()
        )
        assert len(a) == 5  # NULL text dropped, empty + ws-only kept
        pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False)

    def test_gibberish_scores_lower(self, ray_session):
        common = "the quick brown fox jumps over the lazy dog"
        corpus = [common] * 20 + ["zxqj vvwk pqrs ttyu"]
        t = pa.table({"doc_id": list(range(len(corpus))), "text": corpus})
        out = (
            TX.unigram_logprob_ds(ray.data.from_arrow(t), "text", "doc_id")
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out["logprob"].iloc[-1] < out["logprob"].iloc[0]


# ---------------------------------------------------------------------------
# distributed k-means + SemDeDup (ops.cluster)
# ---------------------------------------------------------------------------


def _blob_table(rng, centers, per, dim=8, spread=0.02):
    rows, labels = [], []
    for ci, c in enumerate(centers):
        pts = c + rng.randn(per, dim) * spread
        rows.append(pts)
        labels.extend([ci] * per)
    m = np.vstack(rows).astype(np.float32)
    t = pa.table(
        {
            "vec_id": list(range(len(m))),
            "embedding": [r.tolist() for r in m],
            "blob": labels,
        }
    )
    return t, m, np.array(labels)


def _brute_spherical_lloyd(x, init, iters):
    # driver-side reference with the same semantics as kmeans_fit_ds:
    # cosine assignment, mean, renormalize, empty cluster keeps centroid
    def norm(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    x = norm(x.astype(np.float64))
    cent = norm(init.astype(np.float64))
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        new = cent.copy()
        for c in range(len(cent)):
            mask = assign == c
            if mask.any():
                new[c] = x[mask].mean(axis=0)
        cent = norm(new)
    return cent.astype(np.float32)


class TestCluster:
    def test_fit_matches_driver_reference(self, ray_session):
        from vald.ops import cluster as CL

        rng = np.random.RandomState(3)
        centers = np.eye(3, 8) * 1.0
        t, m, _ = _blob_table(rng, centers, per=40)
        init = m[[0, 40, 80]]
        got = CL.kmeans_fit_ds(
            ray.data.from_arrow(t), k=3, init=init, iters=5, tol=0.0
        )
        want = _brute_spherical_lloyd(m, init, iters=5)
        assert np.allclose(got, want, atol=1e-5)

    def test_assign_recovers_blobs(self, ray_session):
        from vald.ops import cluster as CL

        rng = np.random.RandomState(5)
        centers = np.eye(3, 8) * 1.0
        t, m, labels = _blob_table(rng, centers, per=50)
        ds = ray.data.from_arrow(t)
        cents = CL.kmeans_fit_ds(ds, k=3, iters=10, seed=1)
        out = CL.kmeans_assign_ds(ds, cents).to_pandas().sort_values("vec_id")
        # clusters are a permutation of blob labels (purity 1.0)
        df = out.assign(blob=labels)
        purity = df.groupby("cluster")["blob"].agg(lambda s: s.value_counts().iloc[0] / len(s))
        assert (purity == 1.0).all()
        assert (out["centroid_sim"] > 0.9).all()

    def test_semdedup_drops_duplicates(self, ray_session):
        from vald.ops import cluster as CL

        rng = np.random.RandomState(7)
        centers = np.eye(2, 8) * 1.0
        t, m, _ = _blob_table(rng, centers, per=20, spread=0.2)
        # append exact copies of rows 0..4 with new ids
        dup = m[:5]
        t2 = pa.table(
            {
                "vec_id": list(range(len(m), len(m) + 5)),
                "embedding": [r.tolist() for r in dup],
                "blob": [0] * 5,
            }
        )
        both = pa.concat_tables([t, t2])
        out = CL.semdedup_ds(
            ray.data.from_arrow(both),
            threshold=0.9999,
            k=2,
            iters=5,
            seed=2,
        ).to_pandas()
        # each duplicated vector survives exactly once
        assert len(out) == len(m)
        assert set(out.columns) == {"vec_id", "embedding", "blob"}
        surv = set(out["vec_id"])
        for orig, copy in zip(range(5), range(len(m), len(m) + 5)):
            assert (orig in surv) ^ (copy in surv)

    def test_semdedup_single_cluster_matches_greedy(self, ray_session):
        from vald.ops import cluster as CL

        rng = np.random.RandomState(11)
        m = rng.randn(30, 6).astype(np.float32)
        t = pa.table(
            {"vec_id": list(range(30)), "embedding": [r.tolist() for r in m]}
        )
        cents = np.ones((1, 6), dtype=np.float32)
        out = CL.semdedup_ds(
            ray.data.from_arrow(t),
            threshold=0.5,
            centroids=cents,
        ).to_pandas()

        # brute-force greedy reference: ascending centroid sim, tie id
        def norm(a):
            n = np.linalg.norm(a, axis=1, keepdims=True)
            n[n == 0] = 1.0
            return a / n

        x = norm(m.astype(np.float64))
        c = norm(cents.astype(np.float64))
        sim_c = (x @ c.T)[:, 0]
        order = np.lexsort((np.arange(30), sim_c))
        sims = x @ x.T
        kept = []
        for i in order:
            if not kept or sims[i, kept].max() < 0.5:
                kept.append(int(i))
        assert sorted(out["vec_id"]) == sorted(kept)

    def test_semdedup_hot_cluster_valve(self, ray_session):
        from vald.ops import cluster as CL

        rng = np.random.RandomState(13)
        m = rng.randn(64, 4).astype(np.float32)
        t = pa.table(
            {"vec_id": list(range(64)), "embedding": [r.tolist() for r in m]}
        )
        cents = np.ones((1, 4), dtype=np.float32)
        # cap forces hash sub-splits; with threshold>1 nothing can be
        # dropped so every row must still come through exactly once
        out = CL.semdedup_ds(
            ray.data.from_arrow(t),
            threshold=1.1,
            centroids=cents,
            group_cap=10,
        ).to_pandas()
        assert sorted(out["vec_id"]) == list(range(64))

    def test_kmeans_needs_k_rows(self, ray_session):
        from vald.ops import cluster as CL

        t = pa.table({"vec_id": [0], "embedding": [[1.0, 0.0]]})
        with pytest.raises(ValueError):
            CL.kmeans_fit_ds(ray.data.from_arrow(t), k=3, iters=1)


# ---------------------------------------------------------------------------
# token-budget selection (ops.sample.select_by_budget)
# ---------------------------------------------------------------------------


class TestSelectByBudget:
    def _table(self):
        return pa.table(
            {
                "id": list(range(10)),
                "grp": ["a", "a", "a", "b", "b", None, "a", "b", "a", "b"],
                "q": [9.0, 8.0, 7.0, 9.0, None, 5.0, 6.0, 3.0, 5.0, 2.0],
                "tok": [4, 3, 5, 6, 2, 1, 2, 4, None, 3],
            }
        )

    def _reference(self, budget):
        import pandas as pd

        df = self._table().to_pandas()
        df = df.dropna(subset=["grp", "q", "tok"])
        df = df.sort_values(["grp", "q", "id"], ascending=[True, False, True])
        df["cum_tokens"] = df.groupby("grp")["tok"].cumsum().astype(int)
        return df[df["cum_tokens"] <= budget]

    def test_matches_pandas_window(self, ray_session):
        from vald.ops.sample import select_by_budget

        for budget in (5, 9, 100):
            out = (
                select_by_budget(
                    ray.data.from_arrow(self._table()),
                    "grp",
                    [("q", "descending"), ("id", "ascending")],
                    "tok",
                    budget,
                )
                .to_pandas()
                .sort_values("id")
            )
            ref = self._reference(budget).sort_values("id")
            assert out["id"].tolist() == ref["id"].tolist()
            assert out["cum_tokens"].tolist() == ref["cum_tokens"].tolist()

    def test_bucket_count_invariance(self, ray_session):
        from vald.ops.sample import select_by_budget

        outs = []
        for nb in (1, 7):
            out = (
                select_by_budget(
                    ray.data.from_arrow(self._table()),
                    "grp",
                    [("q", "descending"), ("id", "ascending")],
                    "tok",
                    9,
                    num_buckets=nb,
                )
                .to_pandas()
                .sort_values("id")
                .reset_index(drop=True)
            )
            outs.append(out)
        assert outs[0].equals(outs[1])

    def test_empty_input(self, ray_session):
        from vald.ops.sample import select_by_budget

        t = self._table().slice(0, 0)
        out = select_by_budget(
            ray.data.from_arrow(t), "grp", [("q", "descending")], "tok", 5
        ).to_pandas()
        assert len(out) == 0


# ---------------------------------------------------------------------------
# mixture rebalancing (ops.sample.mix_sources)
# ---------------------------------------------------------------------------


class TestMixSources:
    def _table(self):
        rng = np.random.RandomState(19)
        grps = ["en"] * 60 + ["de"] * 25 + ["fr"] * 15 + ["xx"] * 7
        ids = rng.permutation(len(grps)).tolist()
        return pa.table({"id": ids, "grp": grps})

    def _reference(self, t, targets):
        df = t.to_pandas()
        df = df[df["grp"].isin([g for g, p in targets.items() if p > 0])]
        counts = df.groupby("grp")["id"].count().to_dict()
        present = [g for g in targets if counts.get(g, 0) > 0 and targets[g] > 0]
        scale = min(counts[g] / targets[g] for g in present)
        out = []
        for g, p in targets.items():
            k = int(np.floor(p * scale))
            sub = df[df["grp"] == g].copy()
            sub["h"] = (sub["id"] * 2654435761) % (1 << 32)
            sub = sub.sort_values(["h", "id"]).head(k)
            out.append(sub[["id", "grp"]])
        import pandas as pd

        return pd.concat(out).sort_values("id").reset_index(drop=True)

    def test_matches_reference_and_quotas(self, ray_session):
        from vald.ops.sample import mix_sources

        targets = {"en": 0.5, "de": 0.3, "fr": 0.2}
        t = self._table()
        out = (
            mix_sources(ray.data.from_arrow(t), "grp", "id", targets)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        ref = self._reference(t, targets)
        assert out["id"].tolist() == ref["id"].tolist()
        # proportions hold: fr (15 rows / 0.2 → scale 75) is the
        # bottleneck → quotas en 37, de 22, fr 15
        sizes = out.groupby("grp")["id"].count().to_dict()
        assert sizes == {"en": 37, "de": 22, "fr": 15}
        assert "xx" not in set(out["grp"])

    def test_empty_targets_and_missing_group(self, ray_session):
        from vald.ops.sample import mix_sources

        t = self._table()
        assert (
            mix_sources(ray.data.from_arrow(t), "grp", "id", {}).count() == 0
        )
        assert (
            mix_sources(
                ray.data.from_arrow(t), "grp", "id", {"zz": 1.0}
            ).count()
            == 0
        )


# ---------------------------------------------------------------------------
# media resize plumbing (ops.multimodal.resize_media)
# ---------------------------------------------------------------------------


class TestResizeMedia:
    def test_resize_composes_with_decode(self, ray_session):
        ds = MM.fake_media_dataset(20, kind="image")
        resized = MM.resize_media(ds, 16, 24)
        out = MM.decode_media(resized).to_pandas().sort_values("media_id")
        assert len(out) == 20
        assert (out["height"] == 16).all() and (out["width"] == 24).all()
        assert out["decode_error"].isna().all()

    def test_resize_preserves_nn_sample(self, ray_session):
        # nearest-neighbour resize of a payload equals the same numpy
        # fancy-index applied to the decoded original
        ds = MM.fake_media_dataset(3, kind="image")
        orig = {r["media_id"]: r["payload"] for r in ds.take_all()}
        res = {
            r["media_id"]: r["payload"]
            for r in MM.resize_media(ds, 8, 8).take_all()
        }
        for mid, p in orig.items():
            d = MM._decode_payload(p)
            h, w = d["height"], d["width"]
            planes = len(d["body"]) // (h * w)
            grid = d["body"][: planes * h * w].reshape(planes, h, w)
            ri = (np.arange(8) * h // 8).astype(np.intp)
            ci = (np.arange(8) * w // 8).astype(np.intp)
            want = grid[:, ri[:, None], ci[None, :]].tobytes()
            got = MM._decode_payload(res[mid])
            assert got["height"] == 8 and got["width"] == 8
            assert got["body"].tobytes() == want

    def test_resize_drops_poison(self, ray_session):
        t = pa.table(
            {
                "media_id": pa.array([1, 2], type=pa.int64()),
                "kind": ["image", "image"],
                "payload": pa.array([b"garbage", None][0:1] + [b"junk"], type=pa.binary()),
                "meta_json": ["{}", "{}"],
            }
        )
        out = MM.resize_media(ray.data.from_arrow(t), 8, 8).to_pandas()
        assert len(out) == 0


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (ops.stats.heavy_hitters)
# ---------------------------------------------------------------------------


class TestHeavyHitters:
    def test_exact_regime_matches_value_counts(self, ray_session):
        from vald.ops.stats import heavy_hitters

        rng = np.random.RandomState(5)
        vals = rng.zipf(1.5, size=4000) % 100
        t = pa.table({"v": pa.array(vals, type=pa.int64())})
        out = heavy_hitters(
            ray.data.from_arrow(t).repartition(6), "v", k=10, capacity=10_000
        ).to_pandas()
        vc = pd.Series(vals).value_counts()
        ref = (
            vc.rename_axis("v")
            .reset_index(name="n")
            .sort_values(["n", "v"], ascending=[False, True])
            .head(10)
            .reset_index(drop=True)
        )
        assert out["v"].tolist() == ref["v"].tolist()
        assert out["est_count"].tolist() == ref["n"].tolist()
        # E = 0 in the exact regime → bounds collapse
        assert (out["max_count"] == out["est_count"]).all()

    def test_compressed_regime_bounds_hold(self, ray_session):
        from vald.ops.stats import heavy_hitters

        rng = np.random.RandomState(9)
        # one dominant value + a long uniform tail, tiny capacity
        vals = np.concatenate(
            [np.full(3000, 7), rng.randint(100, 5000, size=9000)]
        )
        rng.shuffle(vals)
        t = pa.table({"v": pa.array(vals, type=pa.int64())})
        out = heavy_hitters(
            ray.data.from_arrow(t).repartition(8), "v", k=5, capacity=50
        ).to_pandas()
        true = pd.Series(vals).value_counts()
        # the dominant value must surface, ranked first
        assert out.loc[0, "v"] == 7
        # MG bounds: est <= true <= max for every reported value
        for _, r in out.iterrows():
            tc = int(true.get(r["v"], 0))
            assert r["est_count"] <= tc <= r["max_count"], r.to_dict()
        # compression actually happened
        assert (out["max_count"] > out["est_count"]).any()

    def test_null_values_dropped_and_empty(self, ray_session):
        from vald.ops.stats import heavy_hitters

        t = pa.table({"v": pa.array(["a", None, "a", "b", None])})
        out = heavy_hitters(ray.data.from_arrow(t), "v", k=2).to_pandas()
        assert out["v"].tolist() == ["a", "b"]
        assert out["est_count"].tolist() == [2, 1]
        empty = pa.table({"v": pa.array([], type=pa.string())})
        assert len(heavy_hitters(ray.data.from_arrow(empty), "v", k=3)) == 0


# ---------------------------------------------------------------------------
# JL random projection (ops.similarity.random_project)
# ---------------------------------------------------------------------------


class TestRandomProject:
    def test_matches_local_matmul_and_deterministic(self, ray_session):
        from vald.ops.similarity import random_project

        rng = np.random.RandomState(3)
        m = rng.standard_normal((40, 64)).astype(np.float32)
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(40), type=pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(m.ravel(), type=pa.float32()), 64
                ),
            }
        )
        out = (
            random_project(
                ray.data.from_arrow(t).repartition(4), "embedding", 16, seed=7
            )
            .to_pandas()
            .sort_values("vec_id")
        )
        R = (
            np.random.default_rng(np.random.SeedSequence([7, 64, 16]))
            .standard_normal((64, 16))
            / np.sqrt(16)
        ).astype(np.float32)
        want = m @ R
        got = np.stack(out["embedding"].to_numpy())
        assert got.shape == (40, 16)
        np.testing.assert_allclose(got, want, rtol=1e-5)
        # run-to-run / partitioning determinism
        again = (
            random_project(ray.data.from_arrow(t), "embedding", 16, seed=7)
            .to_pandas()
            .sort_values("vec_id")
        )
        np.testing.assert_array_equal(
            np.stack(again["embedding"].to_numpy()), got
        )

    def test_normalize_out_col_and_nulls(self, ray_session):
        from vald.ops.similarity import random_project

        m = np.eye(8, dtype=np.float32) * 5
        emb = [row.tolist() for row in m] + [None]
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(9), type=pa.int64()),
                "embedding": pa.array(emb, type=pa.list_(pa.float32(), 8)),
            }
        )
        out = (
            random_project(
                ray.data.from_arrow(t),
                "embedding",
                4,
                normalize=True,
                out_col="proj",
            )
            .to_pandas()
            .sort_values("vec_id")
        )
        assert len(out) == 8  # NULL embedding dropped
        assert "embedding" in out.columns and "proj" in out.columns
        norms = np.linalg.norm(np.stack(out["proj"].to_numpy()), axis=1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
        with pytest.raises(ValueError):
            random_project(ray.data.from_arrow(t), "embedding", 0)


# ---------------------------------------------------------------------------
# grouped vector mean (ops.stats.group_vector_mean)
# ---------------------------------------------------------------------------


class TestGroupVectorMean:
    def test_matches_pandas_and_partition_invariant(self, ray_session):
        from vald.ops.stats import group_vector_mean

        rng = np.random.RandomState(4)
        n, d = 300, 12
        labels = rng.randint(0, 7, size=n)
        m = rng.standard_normal((n, d)).astype(np.float32)
        t = pa.table(
            {
                "label": pa.array(labels, type=pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(m.ravel(), type=pa.float32()), d
                ),
            }
        )
        for parts in (1, 5):
            out = (
                group_vector_mean(
                    ray.data.from_arrow(t).repartition(parts),
                    "label",
                    "embedding",
                )
                .to_pandas()
                .sort_values("label")
                .reset_index(drop=True)
            )
            assert out["label"].tolist() == sorted(set(labels.tolist()))
            for _, r in out.iterrows():
                sel = m[labels == r["label"]].astype(np.float64)
                assert r["n"] == len(sel)
                np.testing.assert_allclose(
                    np.array(r["mean"]), sel.mean(axis=0), rtol=1e-12
                )

    def test_null_rows_dropped_and_string_keys(self, ray_session):
        from vald.ops.stats import group_vector_mean

        t = pa.table(
            {
                "label": pa.array(["a", "a", None, "b"]),
                "embedding": pa.array(
                    [[1.0, 3.0], [3.0, 5.0], [9.0, 9.0], None],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
        out = (
            group_vector_mean(ray.data.from_arrow(t), "label", "embedding")
            .to_pandas()
            .sort_values("label")
        )
        # NULL label and NULL embedding rows both dropped → only 'a'
        assert out["label"].tolist() == ["a"]
        assert out["n"].tolist() == [2]
        np.testing.assert_allclose(np.array(out["mean"].iloc[0]), [2.0, 4.0])


# ---------------------------------------------------------------------------
# grouped t-digest quantiles (ops.stats.group_quantile_sketch)
# ---------------------------------------------------------------------------


class TestGroupQuantileSketch:
    def test_within_tdigest_error_of_exact(self, ray_session):
        from vald.ops.stats import group_quantile_sketch

        rng = np.random.RandomState(12)
        n = 6000
        keys = rng.randint(0, 4, size=n)
        vals = np.exp(rng.standard_normal(n))  # skewed
        t = pa.table(
            {
                "k": pa.array(keys, type=pa.int64()),
                "v": pa.array(vals, type=pa.float64()),
            }
        )
        for parts in (1, 6):
            out = (
                group_quantile_sketch(
                    ray.data.from_arrow(t).repartition(parts),
                    "k",
                    "v",
                    [0.1, 0.5, 0.9],
                )
                .to_pandas()
                .sort_values(["k", "q"])
                .reset_index(drop=True)
            )
            assert len(out) == 4 * 3
            for _, r in out.iterrows():
                sel = np.sort(vals[keys == r["k"]])
                assert r["n"] == len(sel)
                # rank error bound: the reported value's true rank must
                # be within ~2% of the requested q (δ=200 ⇒ ≪ this)
                rank = np.searchsorted(sel, r["value"]) / len(sel)
                assert abs(rank - r["q"]) < 0.02, (r["k"], r["q"], rank)

    def test_null_nan_policy_and_empty(self, ray_session):
        from vald.ops.stats import group_quantile_sketch

        t = pa.table(
            {
                "k": pa.array(["a", "a", "a", None, "b"]),
                "v": pa.array([1.0, 2.0, None, 5.0, float("nan")]),
            }
        )
        out = (
            group_quantile_sketch(ray.data.from_arrow(t), "k", "v", [0.5])
            .to_pandas()
            .sort_values("k")
        )
        # b's only value is NaN → digest empty → still emits with n=0?
        # policy: NaN dropped by TDigest.update, so b has an empty
        # digest; the group emits n=0 rows
        a = out[out["k"] == "a"]
        assert a["n"].tolist() == [2]
        assert abs(a["value"].iloc[0] - 1.5) < 0.51  # median of {1,2}


# ---------------------------------------------------------------------------
# grouped HLL distinct (ops.stats.group_distinct_sketch)
# ---------------------------------------------------------------------------


class TestGroupDistinctSketch:
    def test_within_hll_error_of_exact(self, ray_session):
        from vald.ops.stats import group_distinct_sketch

        rng = np.random.RandomState(6)
        n = 30000
        keys = rng.randint(0, 3, size=n)
        # distinct cardinality differs by key: ~100, ~1000, ~5000
        pools = {0: 100, 1: 1000, 2: 5000}
        vals = np.array([rng.randint(0, pools[k]) * 10 + k for k in keys])
        t = pa.table(
            {
                "k": pa.array(keys, type=pa.int64()),
                "v": pa.array(vals, type=pa.int64()),
            }
        )
        for parts in (1, 7):
            out = (
                group_distinct_sketch(
                    ray.data.from_arrow(t).repartition(parts), "k", "v"
                )
                .to_pandas()
                .set_index("k")
                .sort_index()
            )
            for k in (0, 1, 2):
                exact = len(np.unique(vals[keys == k]))
                est = out.loc[k, "n_distinct_est"]
                assert abs(est - exact) / exact < 0.05, (k, exact, est)

    def test_null_policy(self, ray_session):
        from vald.ops.stats import group_distinct_sketch

        t = pa.table(
            {
                "k": pa.array(["a", "a", "a", None, "b"]),
                "v": pa.array([1, 1, None, 7, 9], type=pa.int64()),
            }
        )
        out = (
            group_distinct_sketch(ray.data.from_arrow(t), "k", "v")
            .to_pandas()
            .sort_values("k")
        )
        assert out["k"].tolist() == ["a", "b"]
        assert abs(out["n_distinct_est"].iloc[0] - 1) < 0.1
        assert abs(out["n_distinct_est"].iloc[1] - 1) < 0.1


class TestGroupLinreg:
    def test_matches_numpy(self, ray_session):
        from vald.ops.stats import group_linreg_ds

        rng = np.random.default_rng(13)
        ks, xs, ys = [], [], []
        for g, (a, b) in enumerate([(2.0, 1.0), (-0.5, 3.0), (0.0, 7.0)]):
            x = rng.uniform(0, 10, 200)
            ks += [f"g{g}"] * 200
            xs += x.tolist()
            ys += (a * x + b + rng.normal(0, 0.1, 200)).tolist()
        # pairwise-NULL and NaN rows must be excluded
        ks += ["g0", "g0", "g0"]
        xs += [None, 5.0, float("nan")]
        ys += [1.0, None, 2.0]
        t = pa.table({"k": ks, "x": pa.array(xs, pa.float64()),
                      "y": pa.array(ys, pa.float64())})
        out = (
            group_linreg_ds(ray.data.from_arrow(t).repartition(4), "k", "x", "y")
            .to_pandas()
            .set_index("k")
        )
        for g, (a, b) in enumerate([(2.0, 1.0), (-0.5, 3.0), (0.0, 7.0)]):
            x = np.array(xs[g * 200:(g + 1) * 200], dtype=float)
            y = np.array(ys[g * 200:(g + 1) * 200], dtype=float)
            slope, intercept = np.polyfit(x, y, 1)
            row = out.loc[f"g{g}"]
            assert row["n"] == 200
            assert abs(row["slope"] - slope) < 1e-9
            assert abs(row["intercept"] - intercept) < 1e-9
            ss_res = ((y - (row["slope"] * x + row["intercept"])) ** 2).sum()
            ss_tot = ((y - y.mean()) ** 2).sum()
            assert abs(row["r2"] - (1 - ss_res / ss_tot)) < 1e-9

    def test_degenerate_groups(self, ray_session):
        from vald.ops.stats import group_linreg_ds

        t = pa.table(
            {
                "k": ["one", "const_x", "const_x", "const_y", "const_y"],
                "x": pa.array([1.0, 2.0, 2.0, 1.0, 3.0], pa.float64()),
                "y": pa.array([5.0, 1.0, 2.0, 4.0, 4.0], pa.float64()),
            }
        )
        out = (
            group_linreg_ds(ray.data.from_arrow(t), "k", "x", "y")
            .to_pandas()
            .set_index("k")
        )
        assert np.isnan(out.loc["one", "slope"])       # n < 2
        assert np.isnan(out.loc["const_x", "slope"])   # zero x variance
        assert out.loc["const_y", "slope"] == 0.0      # flat fit is valid
        assert out.loc["const_y", "intercept"] == 4.0
        assert np.isnan(out.loc["const_y", "r2"])      # zero y variance

"""Deterministic synthetic source-code corpus generator + violation
injector (FIXTURES.md §2; the north-rule input table BASELINE.json:16:
``(repo:string, path:string, commit:string, lang:string, content:string)``).

Everything is a pure function of ``(row_index, seed)`` — splitmix64
streams, no RandomState — so generation is (a) distributed via
``ray.data.range(n).map_batches(...)`` with no driver-side data, and
(b) reproducible row-for-row at any parallelism: the injected-violation
ground truth (``truth_table``) and the per-row ``sha256(content)``
invariant can be recomputed independently of the corpus Dataset.

Injected violation classes (slot = h % 1000, rate 0.1% each; FIXTURES §2
plus a 9th class for the B3 invariant):
  0 corpus.commit.pattern   1 corpus.lang.enum       2 corpus.path.required
  3 corpus.content.minLength  4 corpus.content.maxLength
  5 corpus.key.unique (duplicates a CLEAN earlier row's key)
  6 corpus.repo.refint (ghost repo)  7 corpus.lang_ext.dependency
  8 corpus.content_sha.sha_equal (stored sha corrupted — the per-row
    content-sha256-equality invariant, BASELINE.json:16)
Rows with slot >= 9 are clean. Duplicate targets skip injected rows so
violation classes never overlap on one row (keeps the
injection-totality test exact, SURVEY.md §5.2.6a).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

__all__ = [
    "LANGS",
    "CORPUS_SPEC",
    "gen_batch",
    "corpus_dataset",
    "repos_table",
    "truth_table",
    "write_corpus",
    "row_ref_of",
]

LANGS = ["py", "js", "java", "go", "rs", "c", "md"]
_MAXLEN = 65536  # maxLength bound; clean rows stay <= 32768
_CLEAN_SLOT = 9  # slots >= this are clean
_DUP_MIN_IDX = 10

CORPUS_SPEC: dict = {
    "table": "corpus",
    "row_ref": ["repo", "commit", "path"],
    "row_ref_template": "{repo}@{commit}:{path}",
    "partition_by": "repo",
    "num_partitions": 8,
    "columns": {
        "repo": {"required": True, "type": "string"},
        "path": {"required": True},
        "commit": {"required": True, "pattern": "^[0-9a-f]{40}$"},
        "lang": {"enum": LANGS},
        "content": {"required": True, "minLength": 1, "maxLength": _MAXLEN},
    },
    "checks": [
        {
            # B3 per-row invariant: engine-computed sha256(content) must
            # equal the stored hash (BASELINE.json:16)
            "kind": "sha_equal",
            "column": "content",
            "expected": "content_sha",
            "constraint_id": "corpus.content_sha.sha_equal",
        },
        {
            "kind": "pair_in_set",
            "id": "lang_ext",
            "constraint_id": "corpus.lang_ext.dependency",
            "left": {"column": "lang"},
            "right": {"fn": "file_ext", "column": "path"},
            "pairs": [[lang, lang] for lang in LANGS],
            "guard_left_in_domain": True,  # cobol rows fail enum, not this
        },
        {
            "kind": "unique",
            "columns": ["repo", "path", "commit"],
            "constraint_id": "corpus.key.unique",
        },
        {
            "kind": "refint",
            "columns": ["repo"],
            "parent_table": "repos",
            "parent_columns": ["repo"],
            "constraint_id": "corpus.repo.refint",
        },
    ],
}

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):  # uint64 wraparound is the point
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & _M64
        z = x
        z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _M64
        z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _M64
        return z ^ (z >> np.uint64(31))


def _stream(idx: np.ndarray, seed: int, k: int) -> np.ndarray:
    base = _splitmix64(np.uint64((seed * 1315423911 + k * 2654435761) & 0xFFFFFFFFFFFFFFFF))
    return _splitmix64(idx.astype(np.uint64) ^ base)


def _n_repos(n_rows: int) -> int:
    return max(10, n_rows // 200)


# deterministic pseudo-source base text (~256 KiB), sliced per row
def _base_text() -> str:
    lines = []
    i = 0
    while sum(len(x) for x in lines) < 262144:
        lines.append(
            f"def fn_{i}(x, y):\n    # compute block {i}\n    acc = x * {i % 97} + y\n"
            f"    if acc % {2 + i % 11} == 0:\n        return acc\n    return acc - {i % 13}\n\n"
        )
        i += 1
    return "".join(lines)


_BASE = _base_text()
_BASE_LEN = len(_BASE)


def _slots(idx: np.ndarray, seed: int) -> np.ndarray:
    s = (_stream(idx, seed, 0) % np.uint64(1000)).astype(np.int64)
    s = np.where(idx < _DUP_MIN_IDX, 999, s)  # tiny indices are always clean
    return s


def _base_fields(idx: np.ndarray, n_rows: int, seed: int) -> dict[str, np.ndarray]:
    """Clean (pre-injection) fields, fully vectorized."""
    R = _n_repos(n_rows)
    u = _stream(idx, seed, 1).astype(np.float64) / 2**64
    rank = np.clip((R**u).astype(np.int64), 1, R)  # log-uniform → Zipf-ish head
    lang_i = (_stream(idx, seed, 2) % np.uint64(len(LANGS))).astype(np.int64)
    dir_i = (_stream(idx, seed, 3) % np.uint64(64)).astype(np.int64)
    h4 = _stream(idx, seed, 4)
    h5 = _stream(idx, seed, 5)
    ulen = _stream(idx, seed, 6).astype(np.float64) / 2**64
    length = (64 * (512.0**ulen)).astype(np.int64)  # 64 .. 32768, log-uniform
    off = (_stream(idx, seed, 7) % np.uint64(max(1, _BASE_LEN - 40000))).astype(np.int64)
    return {
        "rank": rank,
        "lang_i": lang_i,
        "dir_i": dir_i,
        "h4": h4,
        "h5": h5,
        "length": length,
        "off": off,
    }


def _dup_target(i: int, seed: int) -> int:
    """Index whose key a slot-5 row duplicates: nearest CLEAN earlier row."""
    h = int(_stream(np.array([i], dtype=np.uint64), seed, 8)[0])
    j = i - 1 - (h % 5)
    while j > 0 and int(_slots(np.array([j], dtype=np.uint64), seed)[0]) < _CLEAN_SLOT:
        j -= 1
    return max(j, 0)


def _key_strings(f: dict, i: int, idx_val: int) -> tuple[str, str, str]:
    repo = f"org{f['rank'][i] % 23}/repo{f['rank'][i]}"
    ext = LANGS[f["lang_i"][i]]
    path = f"src/d{f['dir_i'][i]}/f{idx_val}.{ext}"
    commit = f"{f['h4'][i]:016x}{f['h5'][i]:016x}{(int(f['h4'][i]) ^ int(f['h5'][i])) & 0xFFFFFFFF:08x}"
    return repo, path, commit


def _clean_key_of(j: int, n_rows: int, seed: int) -> tuple[str, str, str]:
    f = _base_fields(np.array([j], dtype=np.uint64), n_rows, seed)
    return _key_strings(f, 0, j)


def _clean_row_of(j: int, n_rows: int, seed: int) -> tuple[str, str, str, str]:
    f = _base_fields(np.array([j], dtype=np.uint64), n_rows, seed)
    repo, path, commit = _key_strings(f, 0, j)
    return repo, path, commit, LANGS[f["lang_i"][0]]


def gen_batch(idx: np.ndarray, n_rows: int, seed: int = 42) -> pa.Table:
    """Rows for the given indices — pure, deterministic, vectorized base
    + per-row injection fixups for the ~0.8% injected rows."""
    idx = np.asarray(idx, dtype=np.uint64)
    n = len(idx)
    f = _base_fields(idx, n_rows, seed)
    slots = _slots(idx, seed)

    repos: list[str | None] = [None] * n
    paths: list[str | None] = [None] * n
    commits: list[str | None] = [None] * n
    langs: list[str | None] = [None] * n
    contents: list[str | None] = [None] * n

    for i in range(n):
        iv = int(idx[i])
        repo, path, commit = _key_strings(f, i, iv)
        lang = LANGS[f["lang_i"][i]]
        length = int(f["length"][i])
        off = int(f["off"][i])
        slot = int(slots[i])

        if slot == 0:  # corpus.commit.pattern — 'X' not in [0-9a-f]
            commit = "XXXX" + commit[4:]
        elif slot == 1:  # corpus.lang.enum
            lang = "cobol"
        elif slot == 2:  # corpus.path.required
            path = None
        elif slot == 3:  # corpus.content.minLength
            length = 0
        elif slot == 4:  # corpus.content.maxLength
            length = _MAXLEN + 1000
        elif slot == 5:  # corpus.key.unique — copy a clean earlier row's
            # key AND lang (lang must stay consistent with the copied
            # path's extension so only `unique` fires on this row)
            repo, path, commit, lang = _clean_row_of(_dup_target(iv, seed), n_rows, seed)
        elif slot == 6:  # corpus.repo.refint — ghost parent
            repo = f"ghost/org{int(f['h4'][i]) % 10}"
        elif slot == 7:  # corpus.lang_ext.dependency — mismatched extension
            wrong = LANGS[(f["lang_i"][i] + 1) % len(LANGS)]
            path = f"src/d{f['dir_i'][i]}/f{iv}.{wrong}"
        # slot 8 (sha corruption) is applied after content is built

        header = f"// {repo} {path} {commit[:8] if commit else ''}\n"
        if length == 0:
            content = ""
        else:
            body_len = max(0, length - len(header))
            if body_len <= _BASE_LEN - off:
                body = _BASE[off : off + body_len]
            else:  # oversized rows wrap the base text
                reps = body_len // _BASE_LEN + 2
                body = (_BASE * reps)[off : off + body_len]
            content = header + body

        repos[i], paths[i], commits[i], langs[i], contents[i] = (
            repo,
            path,
            commit,
            lang,
            content,
        )

    import hashlib

    shas: list[str] = [
        hashlib.sha256((c or "").encode()).hexdigest() for c in contents
    ]
    for i in range(n):
        if int(slots[i]) == 8:  # corpus.content_sha.sha_equal violation
            shas[i] = "0" * 64

    return pa.table(
        {
            "repo": pa.array(repos, type=pa.string()),
            "path": pa.array(paths, type=pa.string()),
            "commit": pa.array(commits, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "content": pa.array(contents, type=pa.string()),
            "content_sha": pa.array(shas, type=pa.string()),
        }
    )


def corpus_dataset(
    n_rows: int, seed: int = 42, override_num_blocks: int | None = None
) -> "ray.data.Dataset":
    """The corpus as a distributed Dataset: ``range(n)`` → gen per batch.
    No driver-side materialization; scales to any n_rows."""
    ds = ray.data.range(n_rows, override_num_blocks=override_num_blocks)

    def gen(batch: pa.Table) -> pa.Table:
        return gen_batch(
            np.asarray(batch["id"].to_numpy(zero_copy_only=False)), n_rows, seed
        )

    return ds.map_batches(gen, batch_format="pyarrow", zero_copy_batch=True)


def repos_table(n_rows: int, seed: int = 42) -> pa.Table:
    """Parent dimension (FIXTURES §2): every legitimate repo name."""
    R = _n_repos(n_rows)
    names = [f"org{r % 23}/repo{r}" for r in range(1, R + 1)]
    return pa.table(
        {
            "repo": pa.array(names),
            "org": pa.array([n.split("/")[0] for n in names]),
            "default_branch": pa.array(["main"] * R),
        }
    )


def row_ref_of(i: int, n_rows: int, seed: int = 42) -> str:
    """Canonical row_ref '{repo}@{commit}:{path}' of row i AFTER injection."""
    t = gen_batch(np.array([i], dtype=np.uint64), n_rows, seed)
    repo = t["repo"][0].as_py() or "<null>"
    path = t["path"][0].as_py() or "<null>"
    commit = t["commit"][0].as_py() or "<null>"
    return f"{repo}@{commit}:{path}"


def truth_table(n_rows: int, seed: int = 42) -> pa.Table:
    """Ground truth: one row per injected violation (FIXTURES §2),
    deduped for unique-key groups. Driver-side; O(#injected)."""
    idx = np.arange(n_rows, dtype=np.uint64)
    slots = _slots(idx, seed)
    inj = np.flatnonzero(slots < _CLEAN_SLOT)
    refs: list[str] = []
    cids: list[str] = []
    slot_cid = {
        0: "corpus.commit.pattern",
        1: "corpus.lang.enum",
        2: "corpus.path.required",
        3: "corpus.content.minLength",
        4: "corpus.content.maxLength",
        6: "corpus.repo.refint",
        7: "corpus.lang_ext.dependency",
        8: "corpus.content_sha.sha_equal",
    }
    seen_dup: set[str] = set()
    for i in inj:
        s = int(slots[i])
        if s == 5:
            repo, path, commit = _clean_key_of(_dup_target(int(i), seed), n_rows, seed)
            ref = f"{repo}@{commit}:{path}"
            if ref not in seen_dup:
                seen_dup.add(ref)
                refs.append(ref)
                cids.append("corpus.key.unique")
        else:
            refs.append(row_ref_of(int(i), n_rows, seed))
            cids.append(slot_cid[s])
    return pa.table({"row_ref": pa.array(refs), "constraint_id": pa.array(cids)})


def write_corpus(out_dir: str, n_rows: int, seed: int = 42) -> None:
    """Materialize corpus + repos + truth as Parquet under out_dir."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    corpus_dataset(n_rows, seed).write_parquet(os.path.join(out_dir, "corpus"))
    pq.write_table(repos_table(n_rows, seed), os.path.join(out_dir, "repos.parquet"))
    pq.write_table(truth_table(n_rows, seed), os.path.join(out_dir, "truth.parquet"))


# ---------------------------------------------------------------------------
# dup-heavy documents corpus — the near-dup-dedup bench input (VERDICT
# r2 items 1 & 5): ~dup_pct% of rows are near-duplicates (a handful of
# words mutated) of an earlier clean doc, so the MinHash-LSH chain has
# real clusters to find at any n_rows. Deterministic (splitmix64),
# distributed (range → gen per batch), no driver materialization.
# ---------------------------------------------------------------------------

_DOC_WORDS = 64
# vocab large enough that 5-char shingles of unrelated docs rarely
# collide in a 4-row LSH band — 512 tokens measured a false-positive
# candidate storm (3.7M candidate pairs at 20k docs); 8192 gives
# realistic web-text collision rates while keeping some pressure
_DOC_VOCAB = np.array([f"tok{i:04d}" for i in range(8192)])
_DOC_MUTATE = 3  # words replaced in a near-dup (Jaccard stays ≳ 0.85)

# High-entropy twin vocabulary: 7 random lowercase letters per token
# (26^7 space) instead of "tokNNNN", whose constant 3-char prefix makes
# many 12-byte shingles low-entropy (df in the thousands at 1M docs —
# the quadratic regime exact all-pairs Jaccard is NOT meant for, see
# BENCH/BASELINE.md note 15). With random letters almost every shingle
# has df ~ cluster size, which is the op's designed regime.
_rng_hi = np.random.RandomState(7)
_DOC_VOCAB_HI = np.array(
    [
        "".join(chr(97 + c) for c in _rng_hi.randint(0, 26, size=7))
        for _ in range(8192)
    ]
)
del _rng_hi


def dup_docs_batch(
    idx: np.ndarray, seed: int = 42, dup_pct: int = 30, hi_entropy: bool = False
) -> pa.Table:
    """(doc_id, text) for the given row indices. Rows with
    ``hash(idx) % 100 < dup_pct`` (and idx ≥ 100) are near-dups: the
    word stream of a base doc up to 1000 rows earlier with
    ``_DOC_MUTATE`` positions rewritten. Base word ids derive from the
    base INDEX (not its realized text), so clusters form around clean
    docs regardless of the base row's own dup status."""
    idx = np.asarray(idx, dtype=np.uint64)
    n = len(idx)
    is_dup = ((_stream(idx, seed, 20) % np.uint64(100)).astype(np.int64) < dup_pct) & (
        idx.astype(np.int64) >= 100
    )
    back = (_stream(idx, seed, 21) % np.uint64(1000)).astype(np.int64) + 1
    base = np.where(is_dup, np.maximum(idx.astype(np.int64) - back, 0), idx.astype(np.int64))
    # per-position word ids, shape (n, W), one vectorized hash pass
    flat = (
        base[:, None].astype(np.uint64) * np.uint64(_DOC_WORDS)
        + np.arange(_DOC_WORDS, dtype=np.uint64)[None, :]
    ).ravel()
    wid = (_stream(flat, seed, 22) % np.uint64(len(_DOC_VOCAB))).reshape(
        n, _DOC_WORDS
    ).astype(np.int64)
    # mutate a few positions of the dup rows (seeded by the row itself)
    dup_rows = np.flatnonzero(is_dup)
    for k in range(_DOC_MUTATE):
        mpos = (_stream(idx[dup_rows], seed, 30 + k) % np.uint64(_DOC_WORDS)).astype(
            np.int64
        )
        mval = (_stream(idx[dup_rows], seed, 40 + k) % np.uint64(len(_DOC_VOCAB))).astype(
            np.int64
        )
        wid[dup_rows, mpos] = mval
    vocab = _DOC_VOCAB_HI if hi_entropy else _DOC_VOCAB
    texts = [" ".join(vocab[row]) for row in wid]
    return pa.table(
        {
            "doc_id": pa.array(idx.astype(np.int64), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )


def dup_docs_dataset(
    n_rows: int,
    seed: int = 42,
    dup_pct: int = 30,
    override_num_blocks: int | None = None,
    hi_entropy: bool = False,
) -> "ray.data.Dataset":
    ds = ray.data.range(n_rows, override_num_blocks=override_num_blocks)

    def gen(batch: pa.Table) -> pa.Table:
        return dup_docs_batch(
            np.asarray(batch["id"].to_numpy(zero_copy_only=False)),
            seed,
            dup_pct,
            hi_entropy,
        )

    return ds.map_batches(gen, batch_format="pyarrow", zero_copy_batch=True)


def write_dup_docs(
    out_dir: str,
    n_rows: int,
    seed: int = 42,
    dup_pct: int = 30,
    hi_entropy: bool = False,
) -> None:
    import os

    os.makedirs(out_dir, exist_ok=True)
    dup_docs_dataset(n_rows, seed, dup_pct, hi_entropy=hi_entropy).write_parquet(out_dir)

"""Text-analysis operators for training-data pipelines: language id,
quality scoring, token counting, document fingerprinting.

All stages are actor-pool ``map_batches`` classes: regexes, stopword
tables and n-gram profiles compile once per actor (B7 pattern); the
per-batch body works on Python strings (inherent for tokenization) but
amortizes all setup and emits compact Arrow columns.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

__all__ = [
    "LangId",
    "language_id",
    "QualityScore",
    "quality_scores",
    "TokenCount",
    "token_counts",
    "Fingerprint",
    "fingerprints",
    "text_stats",
    "text_stats_table",
    "repetition_stats",
    "repetition_table",
]

# Tiny per-language marker tables (top function words; zh detected by
# CJK codepoint ratio). Heuristic n-gram/stopword language id in the
# spirit of the classic Cavnar-Trenkle n-gram approach.
_LANG_MARKERS: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "was", "on", "as"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "von", "mit", "den", "ein", "zu", "im"},
    "es": {"el", "la", "los", "las", "de", "que", "es", "en", "un", "una", "por", "con"},
    "fr": {"le", "la", "les", "des", "de", "est", "et", "un", "une", "dans", "que", "pour"},
}
_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)
_CJK_RE = re.compile(r"[一-鿿㐀-䶿]")


class LangId:
    """Actor: predict language per row from marker-word hits + CJK ratio."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col
        self.word = _WORD_RE
        self.cjk = _CJK_RE
        self.markers = {k: frozenset(v) for k, v in _LANG_MARKERS.items()}

    def predict(self, text: str | None) -> str:
        if not text:
            return "und"
        if len(self.cjk.findall(text)) / max(1, len(text)) > 0.05:
            return "zh"
        words = [w.lower() for w in self.word.findall(text)]
        if not words:
            return "und"
        scores = {
            lang: sum(w in marks for w in words) / len(words)
            for lang, marks in self.markers.items()
        }
        best = max(scores, key=lambda l: (scores[l], l))
        return best if scores[best] > 0.01 else "und"

    def __call__(self, t: pa.Table) -> pa.Table:
        preds = [self.predict(v) for v in t[self.text_col].to_pylist()]
        return t.append_column(self.out_col, pa.array(preds, type=pa.string()))


def language_id(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    concurrency: int | tuple[int, int] = (1, 8),
) -> "ray.data.Dataset":
    return ds.map_batches(
        LangId,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


class QualityScore:
    """Actor: heuristic document-quality features + composite score —
    length, alpha/punct/digit ratios, stopword ratio, mean word length,
    line-repetition ratio. Score in [0, 1]."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word = _WORD_RE
        self.stop = _LANG_MARKERS["en"]
        self.punct = re.compile(r"[.,;:!?()\[\]{}\"'`]")

    def features(self, text: str | None) -> tuple[float, ...]:
        if not text:
            return (0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
        n = len(text)
        words = self.word.findall(text)
        n_words = len(words)
        alpha = sum(c.isalpha() for c in text) / n
        digit = sum(c.isdigit() for c in text) / n
        punct = len(self.punct.findall(text)) / n
        stop = (
            sum(w.lower() in self.stop for w in words) / n_words if n_words else 0.0
        )
        mean_wl = float(np.mean([len(w) for w in words])) if words else 0.0
        lines = text.splitlines() or [text]
        uniq_lines = len(set(lines)) / len(lines)
        return (n, alpha, digit, punct, stop, mean_wl, uniq_lines)

    @staticmethod
    def score(f: tuple[float, ...]) -> float:
        n, alpha, digit, punct, stop, mean_wl, uniq_lines = f
        s = 0.0
        s += 0.2 * min(1.0, n / 500)              # enough text
        s += 0.25 * alpha                          # mostly letters
        s += 0.15 * (1.0 - min(1.0, digit * 5))    # not digit soup
        s += 0.15 * min(1.0, stop * 5)             # natural-language-ish
        s += 0.1 * (1.0 if 3 <= mean_wl <= 10 else 0.0)
        s += 0.15 * uniq_lines                     # not boilerplate
        return round(min(1.0, s), 4)

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = [self.features(v) for v in t[self.text_col].to_pylist()]
        cols = list(zip(*feats))
        t = t.append_column("n_chars_obs", pa.array(cols[0], type=pa.int64()))
        t = t.append_column("alpha_ratio", pa.array(cols[1], type=pa.float64()))
        t = t.append_column("digit_ratio", pa.array(cols[2], type=pa.float64()))
        t = t.append_column("punct_ratio", pa.array(cols[3], type=pa.float64()))
        t = t.append_column("stopword_ratio", pa.array(cols[4], type=pa.float64()))
        t = t.append_column("mean_word_len", pa.array(cols[5], type=pa.float64()))
        t = t.append_column("line_uniq_ratio", pa.array(cols[6], type=pa.float64()))
        t = t.append_column(
            "quality_score", pa.array([self.score(f) for f in feats], type=pa.float64())
        )
        return t


def quality_scores(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    concurrency: int | tuple[int, int] = (1, 8),
) -> "ray.data.Dataset":
    return ds.map_batches(
        QualityScore,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


# GPT2-style pretokenizer regex (public pattern family): contractions,
# words, numbers, punctuation runs, whitespace runs.
_BPEISH_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+(?!\S)|\s+",
    re.UNICODE,
)


class TokenCount:
    """Actor: whitespace token count (+ optionally a BPE-ish pretoken
    count) per row.

    ``n_tokens_ws`` is one vectorized RE2 pass
    (``pc.count_substring_regex(r"\\S+")``) — the same regex semantics
    as the DuckDB oracle's ``string_split_regex('\\s+')``, and equal to
    Python ``str.split()`` everywhere on ASCII whitespace (the corpus
    contract; RE2's ``\\s`` is ASCII-only, so the two diverge only on
    Unicode whitespace like NBSP — where the ORACLE sides with RE2).

    ``n_tokens_bpeish`` needs the lookahead-bearing GPT-2 pretokenizer
    pattern RE2 can't run, so it stays a compiled-``re`` pass — request
    it only when needed via ``modes``: q_budget_select selects on the
    ws count alone and skips the expensive column entirely."""

    def __init__(self, text_col: str = "text", modes=("ws", "bpeish")):
        self.text_col = text_col
        self.modes = tuple(modes)
        self.bpeish = _BPEISH_RE

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t[self.text_col]
        if "ws" in self.modes:
            ws = pc.fill_null(
                pc.count_substring_regex(col, pattern=r"\S+"), 0
            )
            t = t.append_column("n_tokens_ws", pc.cast(ws, pa.int64()))
        if "bpeish" in self.modes:
            bp = [
                0 if not v else sum(1 for _ in self.bpeish.finditer(v))
                for v in col.to_pylist()
            ]
            t = t.append_column(
                "n_tokens_bpeish", pa.array(bp, type=pa.int64())
            )
        return t


def token_counts(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    concurrency: int | tuple[int, int] = (1, 8),
) -> "ray.data.Dataset":
    return ds.map_batches(
        TokenCount,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


class Fingerprint:
    """Actor: winnowing-style document fingerprint — min-wise sample of
    rolling-window hashes (Rabin-Karp base-257 over bytes), hex string.
    Equal texts → equal fingerprints; near-equal texts share most
    fingerprint parts."""

    def __init__(self, text_col: str = "text", window: int = 16, num_mins: int = 8):
        self.text_col = text_col
        self.window = window
        self.num_mins = num_mins

    def fingerprint(self, text: str | None) -> str:
        from .dedup import _shingle_hashes

        if not text:
            return ""
        h = _shingle_hashes(text, self.window)
        mins = np.sort(h)[: self.num_mins]
        return "".join(f"{int(x):016x}" for x in mins)

    def __call__(self, t: pa.Table) -> pa.Table:
        fps = [self.fingerprint(v) for v in t[self.text_col].to_pylist()]
        return t.append_column("fingerprint", pa.array(fps, type=pa.string()))


def fingerprints(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    concurrency: int | tuple[int, int] = (1, 8),
) -> "ray.data.Dataset":
    return ds.map_batches(
        Fingerprint,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# text_stats: fully-vectorized character/token statistics straight from
# the Arrow string buffers — the zero-copy counterpart to the per-row
# actor stages above (no Python string is ever materialized)
# ---------------------------------------------------------------------------

_WS_BYTES = (9, 10, 11, 12, 13, 32)  # str.split() whitespace, ASCII range


def _string_buffers(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(offsets, data) numpy views of a non-null Arrow string column —
    zero-copy except the offset rebase. Handles sliced arrays."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_string(col.type):
        odt = np.int64
    else:
        odt = np.int32
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], dtype=odt)[col.offset : col.offset + len(col) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8)[offs[0] : offs[-1]]
    return offs.astype(np.int64) - int(offs[0]), data


def text_stats_table(t: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """Per-row (n_chars, n_alpha, n_digit, n_tokens) computed with
    numpy over the raw UTF-8 buffer: byte-class masks + prefix sums —
    no per-row Python loop. n_tokens counts maximal non-whitespace
    runs (== len(s.split()) for ASCII text). Null rows count as empty
    (callers mirror with coalesce(text, '') in SQL). n_chars is BYTE
    length — equal to the character count for ASCII corpora; document
    the divergence when feeding multi-byte UTF-8."""
    col = pc.fill_null(t[text_col], "")
    offs, data = _string_buffers(col)
    alpha = ((data >= 65) & (data <= 90)) | ((data >= 97) & (data <= 122))
    digit = (data >= 48) & (data <= 57)
    ws = np.isin(data, _WS_BYTES)
    nonws = ~ws
    # token starts: non-ws byte at a row boundary or after a ws byte
    tok_start = nonws & np.r_[True, ws[:-1]]
    row_starts = offs[:-1][offs[:-1] < len(data)]
    tok_start[row_starts] = nonws[row_starts]

    def rowsum(mask: np.ndarray) -> np.ndarray:
        cs = np.concatenate([[0], np.cumsum(mask, dtype=np.int64)])
        return cs[offs[1:]] - cs[offs[:-1]]

    return pa.table(
        {
            id_col: t[id_col],
            "n_chars": pa.array(offs[1:] - offs[:-1], type=pa.int64()),
            "n_alpha": pa.array(rowsum(alpha), type=pa.int64()),
            "n_digit": pa.array(rowsum(digit), type=pa.int64()),
            "n_tokens": pa.array(rowsum(tok_start), type=pa.int64()),
        }
    )


def text_stats(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Vectorized per-document text statistics (stateless task stage —
    nothing to amortize, so no actor pool)."""
    return ds.map_batches(
        lambda t: text_stats_table(t, text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def repetition_table(
    t: pa.Table, text_col: str, id_col: str, *, delimiter: str | None = None
) -> pa.Table:
    """Per-row token repetition stats (the Gopher-style duplicate-
    unigram quality signal): n_tokens, n_distinct — dup fraction is
    ``1 - n_distinct/n_tokens``. Tokenization is whitespace-run when
    ``delimiter`` is None, else a literal-delimiter split (matching SQL
    ``string_split(text, delimiter)``, which keeps empty tokens).

    Fully vectorized: one Arrow split + one dictionary-encode, distinct
    counting via np.unique over combined (row, code) keys — no per-row
    Python. Rows with NULL text are dropped."""
    t = t.filter(pc.is_valid(t[text_col]))
    id_type = t.schema.field(id_col).type
    empty = pa.table(
        {
            id_col: pa.array([], type=id_type),
            "n_tokens": pa.array([], type=pa.int64()),
            "n_distinct": pa.array([], type=pa.int64()),
        }
    )
    if len(t) == 0:
        return empty
    from ..runtime import compact_strings

    texts = compact_strings(t[text_col])
    if delimiter is None:
        toks = pc.utf8_split_whitespace(texts)
    else:
        toks = pc.split_pattern(texts, pattern=delimiter)
    flat = pc.list_flatten(toks).combine_chunks()
    lens = (
        pc.fill_null(pc.list_value_length(toks), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), lens)
    if delimiter is None:
        # str.split() semantics: whitespace runs never produce empty
        # tokens ("" splits to zero tokens; Arrow's kernel yields [""])
        keep = np.asarray(
            pc.not_equal(flat, pa.scalar("")).to_numpy(zero_copy_only=False),
            dtype=bool,
        )
        if not keep.all():
            flat = flat.filter(pa.array(keep))
            doc_idx = doc_idx[keep]
            lens = np.bincount(doc_idx, minlength=len(t)).astype(np.int64)
    if len(flat) == 0:
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": pa.array(lens),
                "n_distinct": pa.array(np.zeros(len(t), dtype=np.int64)),
            }
        )
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    ndict = max(1, len(enc.dictionary))
    pair_docs = np.unique(doc_idx * ndict + codes) // ndict
    n_distinct = np.bincount(pair_docs, minlength=len(t)).astype(np.int64)
    return pa.table(
        {
            id_col: t[id_col],
            "n_tokens": pa.array(lens),
            "n_distinct": pa.array(n_distinct),
        }
    )


def repetition_stats(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    delimiter: str | None = None,
) -> "ray.data.Dataset":
    """Distributed per-document repetition stats — a stateless
    ``map_batches`` stage (embarrassingly parallel, no shuffle)."""
    return ds.map_batches(
        lambda t: repetition_table(t, text_col, id_col, delimiter=delimiter),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# PII detection / scrubbing (regex extraction machinery)
# ---------------------------------------------------------------------------

# RE2-safe patterns (pyarrow's regex kernels and DuckDB both embed RE2,
# so engine and oracle semantics agree by construction). These are the
# standard curation-pipeline PII classes; callers pass their own dict to
# regex_stats/scrub_text for anything else.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\d{1,3}[ \-.]?\(?\d{2,4}\)?[ \-.]?\d{3,4}[ \-.]?\d{3,4}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def regex_stats_table(
    t: pa.Table, text_col: str, id_col: str, patterns: dict[str, str]
) -> pa.Table:
    """Per-row non-overlapping match counts for each named pattern —
    one vectorized ``pc.count_substring_regex`` call per pattern (RE2
    compiled once inside Arrow per kernel call; zero per-row Python)."""
    texts = pc.fill_null(t[text_col], "")
    cols: dict[str, pa.Array | pa.ChunkedArray] = {id_col: t[id_col]}
    for name, pat in patterns.items():
        cols[f"n_{name}"] = pc.cast(
            pc.count_substring_regex(texts, pat), pa.int64()
        )
    return pa.table(cols)


def regex_stats(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | None = None,
) -> "ray.data.Dataset":
    """Per-document PII/pattern hit counts (stateless, no shuffle).
    Default patterns = ``PII_PATTERNS``."""
    pats = dict(PII_PATTERNS if patterns is None else patterns)
    return ds.map_batches(
        lambda t: regex_stats_table(t, text_col, id_col, pats),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def scrub_table(
    t: pa.Table,
    text_col: str,
    patterns: dict[str, str],
    *,
    replacement: str | None = None,
    out_col: str | None = None,
) -> pa.Table:
    """Redact every match of every pattern. Each class is replaced by
    ``<NAME>`` (e.g. ``<EMAIL>``) unless a single ``replacement`` token
    is given. NULL text stays NULL."""
    out = pc.fill_null(t[text_col], "")
    for name, pat in patterns.items():
        repl = replacement if replacement is not None else f"<{name.upper()}>"
        out = pc.replace_substring_regex(out, pat, repl)
    out = pc.if_else(pc.is_valid(t[text_col]), out, pa.scalar(None, pa.string()))
    dest = out_col or text_col
    if dest in t.column_names:
        return t.set_column(t.column_names.index(dest), dest, out)
    return t.append_column(dest, out)


def scrub_text(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    *,
    replacement: str | None = None,
    out_col: str | None = None,
) -> "ray.data.Dataset":
    """PII scrubbing as a streaming stage: ``replace_substring_regex``
    per pattern, in place (or into ``out_col``). Embarrassingly
    parallel — the 100-TB path is exactly this per-batch kernel."""
    pats = dict(PII_PATTERNS if patterns is None else patterns)
    return ds.map_batches(
        lambda t: scrub_table(
            t, text_col, pats, replacement=replacement, out_col=out_col
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# Document chunking: split long docs into sliding token windows
# (context-length splitting for training pipelines)
# ---------------------------------------------------------------------------


def split_table(
    t: pa.Table,
    text_col: str,
    id_col: str,
    max_tokens: int,
    stride: int,
) -> pa.Table:
    """Explode one batch into sliding-window chunks: chunk ``w`` of a
    doc covers whitespace tokens ``[w*stride, w*stride + max_tokens)``;
    windows start while ``w*stride < n_tokens``. Vectorized: tokenize
    once, rebuild the token lists with empty tokens dropped (str.split
    semantics), then ONE ``list_slice`` + ``binary_join`` per window
    index — the Python loop is over window indexes (longest doc /
    stride), never over rows."""
    from ..runtime import compact_strings

    ids = t[id_col]
    texts = compact_strings(pc.fill_null(t[text_col], ""))
    toks = pc.utf8_split_whitespace(texts)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    lens = (
        pc.fill_null(pc.list_value_length(toks), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), lens)
    nonempty = np.asarray(
        pc.not_equal(flat, pa.scalar("")).to_numpy(zero_copy_only=False),
        dtype=bool,
    )
    if not nonempty.all():
        flat = flat.filter(pa.array(nonempty))
        doc_idx = doc_idx[nonempty]
        lens = np.bincount(doc_idx, minlength=len(t)).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    toks = pa.LargeListArray.from_arrays(pa.array(offsets, type=pa.int64()), flat)
    empty = pa.table(
        {
            id_col: pa.array([], type=t.schema.field(id_col).type),
            "chunk_id": pa.array([], type=pa.int64()),
            "chunk": pa.array([], type=pa.string()),
            "n_tokens": pa.array([], type=pa.int64()),
        }
    )
    if lens.max(initial=0) == 0:
        return empty
    pieces = []
    max_w = int((lens.max() - 1) // stride) + 1
    for w in range(max_w):
        start = w * stride
        active = np.flatnonzero(lens > start)
        if len(active) == 0:
            break
        sub = pc.list_slice(
            toks.take(pa.array(active)), start, start + max_tokens
        )
        pieces.append(
            pa.table(
                {
                    id_col: ids.take(pa.array(active)),
                    "chunk_id": pa.array(
                        np.full(len(active), w, dtype=np.int64)
                    ),
                    "chunk": pc.binary_join(sub, " "),
                    "n_tokens": pc.cast(pc.list_value_length(sub), pa.int64()),
                }
            )
        )
    return pa.concat_tables(pieces) if pieces else empty


def split_documents(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_tokens: int = 512,
    overlap: int = 0,
) -> "ray.data.Dataset":
    """Split documents into overlapping fixed-token-budget chunks —
    the context-length splitter of a training pipeline. Stateless
    ``map_batches`` explode: each batch emits its own chunks, nothing
    shuffles, output rows carry ``(id, chunk_id, chunk, n_tokens)``.
    NULL or all-whitespace docs produce no chunks. ``overlap`` tokens
    are shared between consecutive chunks (``stride = max_tokens -
    overlap``); the final chunk may be shorter than ``max_tokens``.

    Scale note: chunk text is a reslice of the input tokens, so output
    bytes ~= input bytes x (1 + overlap/stride); keep ``batch_size``
    modest for very large docs (the multimodal rule)."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    return ds.map_batches(
        lambda t: split_table(t, text_col, id_col, max_tokens, stride),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# TF-IDF scoring (vocabulary-level feature extraction)
# ---------------------------------------------------------------------------


def tfidf_ds(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    *,
    max_broadcast_terms: int = 2_000_000,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Exact corpus TF-IDF: one output row per (doc, distinct term) with
    ``tf`` (occurrences in the doc), ``df`` (distinct docs containing
    the term), and ``tfidf = tf * ln(N / df)`` where ``N`` counts docs
    with non-null text. Terms are whitespace tokens (str.split
    semantics — empty tokens dropped), reusing ``dedup.token_grams``
    at width 1.

    Shape (100 TB): stage 1 computes term document-frequencies with
    per-batch pre-aggregation (per-doc DISTINCT terms via one Arrow
    dictionary-encode) before a bucketed combine — one row per distinct
    term per batch moves, never one per occurrence; the batch doc count
    rides the same exchange as a NULL-term row (bucketed_group_agg
    groups NULL keys like values), so N needs no second pass. The
    vocabulary is MATERIALIZED as a Dataset and sized with a
    distributed ``count()`` — the driver never holds it before the
    ``max_broadcast_terms`` decision (VERDICT r4 item 1). Two scoring
    routes, byte-identical output (tests force both):

    - vocab <= ``max_broadcast_terms``: the (term, df) table broadcasts
      once via ``ray.put``; scoring is embarrassingly parallel —
      per-batch tf via dictionary-encode + np.unique on (row, code)
      pairs, df gathered with one vectorized ``pc.index_in``.
    - above: the TERM JOIN — per-batch (id, term, tf) rows
      hash-partition ``Dataset.join`` against the vocab on ``term``
      (inner; every tf row's term is in the corpus vocab by
      construction), tfidf computed per joined batch. The vocabulary
      never leaves the object store; the cost is one exchange of the
      tf rows, the B5 planner trade."""
    from ..runtime import (
        bucketed_group_agg,
        collect_arrow,
        join_partitions,
        join_remote_args,
    )

    from .dedup import token_grams

    _EMPTY_DF = pa.table(
        {
            "term": pa.array([], type=pa.string()),
            "df": pa.array([], type=pa.int64()),
        }
    )

    def df_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[text_col]))
        n_docs = len(t)
        toks, doc_idx, _ = token_grams(t, text_col, 1)
        if len(toks) == 0:
            if n_docs == 0:
                return _EMPTY_DF
            return pa.table(
                {
                    "term": pa.array([None], type=pa.string()),
                    "df": pa.array([n_docs], type=pa.int64()),
                }
            )
        enc = toks.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ndict = len(enc.dictionary)
        # distinct (doc, term) pairs -> per-term distinct-doc count
        pair = np.unique(doc_idx * ndict + codes)
        dfc = np.bincount(pair % ndict, minlength=ndict).astype(np.int64)
        out = pa.table(
            {
                "term": enc.dictionary,
                "df": pa.array(dfc),
            }
        )
        # the batch's doc count rides the exchange as the NULL-term row
        return pa.concat_tables(
            [
                out,
                pa.table(
                    {
                        "term": pa.array([None], type=pa.string()),
                        "df": pa.array([n_docs], type=pa.int64()),
                    }
                ),
            ]
        )

    # materialize = reusable barrier: sized by count(), N pulled as one
    # row, and (join path) the all-to-all barrier Dataset.join needs
    vocab_ds = bucketed_group_agg(
        ds.map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True),
        "term",
        [("df", "sum")],
        num_buckets=num_buckets,
    ).materialize()
    n_rows = vocab_ds.count()
    null_t = collect_arrow(
        vocab_ds.map_batches(
            lambda t: t.filter(pc.is_null(t["term"])),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    n_total = int(pc.sum(null_t["df"]).as_py() or 0) if len(null_t) else 0
    n_terms = n_rows - len(null_t)

    def tf_rows(t: pa.Table) -> pa.Table:
        """Per-batch (id, term, tf): distinct (doc, term) pairs with
        occurrence counts via one dictionary-encode + np.unique."""
        t = t.filter(pc.is_valid(t[text_col]))
        toks, doc_idx, _ = token_grams(t, text_col, 1)
        if len(toks) == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=t.schema.field(id_col).type),
                    "term": pa.array([], type=pa.string()),
                    "tf": pa.array([], type=pa.int64()),
                }
            )
        enc = toks.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ndict = len(enc.dictionary)
        pair, tf = np.unique(doc_idx * ndict + codes, return_counts=True)
        rows = (pair // ndict).astype(np.int64)
        term_codes = (pair % ndict).astype(np.int64)
        return pa.table(
            {
                id_col: t[id_col].take(pa.array(rows)),
                "term": enc.dictionary.take(pa.array(term_codes)),
                "tf": pa.array(tf.astype(np.int64)),
            }
        )

    if n_terms > max_broadcast_terms:
        # term-join route: the vocabulary never lands on the driver.
        # nonempty_blocks strips the bucketed combine's schema-less
        # 0-row blocks, which otherwise poison the join aggregators.
        from ..runtime import nonempty_blocks

        vocab_clean = nonempty_blocks(
            vocab_ds.map_batches(
                lambda t: t.filter(pc.is_valid(t["term"])),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).materialize()
        )
        joined = ds.map_batches(
            tf_rows, batch_format="pyarrow", zero_copy_batch=True
        ).join(
            vocab_clean,
            join_type="inner",
            num_partitions=join_partitions(None),
            on=("term",),
            aggregator_ray_remote_args=join_remote_args(),
        )

        def finish(t: pa.Table) -> pa.Table:
            tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
            dfs = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
            tfidf = tf * np.log(float(n_total) / dfs)
            return t.select([id_col, "term", "tf", "df"]).append_column(
                "tfidf", pa.array(tfidf, type=pa.float64())
            )

        return joined.map_batches(finish, batch_format="pyarrow")

    # broadcast route: bounded pull (<= max_broadcast_terms rows)
    vt = collect_arrow(
        vocab_ds.map_batches(
            lambda t: t.filter(pc.is_valid(t["term"])),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    if len(vt) == 0:
        vt = pa.table(
            {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
        )
    terms_ref = ray.put(vt["term"].combine_chunks())
    df_ref = ray.put(vt["df"].to_numpy(zero_copy_only=False).astype(np.int64))

    def score(t: pa.Table) -> pa.Table:
        out = tf_rows(t)
        if len(out) == 0:
            return out.append_column(
                "df", pa.array([], type=pa.int64())
            ).append_column("tfidf", pa.array([], type=pa.float64()))
        idx = pc.index_in(out["term"], value_set=ray.get(terms_ref)).to_numpy(
            zero_copy_only=False
        )
        dfs = ray.get(df_ref)[idx.astype(np.int64)]
        tf = out["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        tfidf = tf * np.log(float(n_total) / dfs)
        return out.append_column("df", pa.array(dfs)).append_column(
            "tfidf", pa.array(tfidf, type=pa.float64())
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Unigram-LM log-probability scoring (CCNet-style quality signal)
# ---------------------------------------------------------------------------


def unigram_logprob_ds(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    *,
    max_broadcast_terms: int = 2_000_000,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Per-doc mean unigram log-probability under the corpus's own
    unigram LM — the shape of CCNet's LM quality filter (docs far below
    the corpus-typical log-prob are boilerplate/gibberish candidates;
    CCNet uses a pretrained KenLM, this op is the self-trained unigram
    variant with the identical pipeline shape). ``logprob =
    mean_tokens ln(count(term) / total_tokens)``; every scored term was
    counted, so no smoothing term is needed and a SQL oracle can
    reproduce the number exactly (queries.q_logprob).

    Shape (100 TB): stage 1 counts term OCCURRENCES with per-batch
    pre-aggregation before a bucketed combine (same exchange discipline
    as tfidf_ds's df pass: one row per distinct term per batch). The
    vocabulary is MATERIALIZED and sized with a distributed ``count()``
    — never pulled to the driver before the ``max_broadcast_terms``
    decision (VERDICT r4 item 1); the model's total-token normalizer is
    a distributed ``sum``. Two scoring routes, identical output:

    - vocab <= threshold: (term, logprob) broadcasts once; scoring is
      embarrassingly parallel — token log-probs gathered with one
      ``pc.index_in``, per-doc means via one segment sum.
    - above: the TERM JOIN — per-doc (id, term, tf) rows (plus a
      NULL-term anchor per zero-token doc, so empty docs survive the
      join) LEFT-OUTER ``Dataset.join`` the vocab on ``term``, then one
      bucketed group-by ``id`` folds ``sum(tf·logp)/sum(tf)``. The join
      route identifies docs by ``id_col`` (must be unique per doc —
      rows sharing an id would fold together); the broadcast route
      scores each input row independently."""
    from ..runtime import (
        bucketed_group_agg,
        collect_arrow,
        join_partitions,
        join_remote_args,
    )

    from .dedup import token_grams

    _EMPTY_CNT = pa.table(
        {
            "term": pa.array([], type=pa.string()),
            "cnt": pa.array([], type=pa.int64()),
        }
    )

    def cnt_partial(t: pa.Table) -> pa.Table:
        toks, _, _ = token_grams(t, text_col, 1)
        if len(toks) == 0:
            return _EMPTY_CNT
        enc = toks.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = np.bincount(codes, minlength=len(enc.dictionary)).astype(np.int64)
        return pa.table({"term": enc.dictionary, "cnt": pa.array(cnt)})

    vocab_ds = bucketed_group_agg(
        ds.map_batches(
            cnt_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        "term",
        [("cnt", "sum")],
        num_buckets=num_buckets,
    ).materialize()
    n_terms = vocab_ds.count()
    total = float(vocab_ds.sum("cnt") or 0.0) if n_terms else 0.0

    if n_terms > max_broadcast_terms:
        # term-join route: per-doc tf rows meet the (term, logp) table
        # in a hash-partitioned join; the vocab stays in the object
        # store end to end.
        def logp_table(t: pa.Table) -> pa.Table:
            cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
            return pa.table(
                {
                    "term": t["term"],
                    "logp": pa.array(np.log(cnt / total), type=pa.float64()),
                }
            )

        from ..runtime import nonempty_blocks

        vocab_lp = nonempty_blocks(
            vocab_ds.map_batches(
                logp_table, batch_format="pyarrow", zero_copy_batch=True
            ).materialize()
        )

        def tf_rows(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t[text_col]))
            id_type = t.schema.field(id_col).type
            toks, doc_idx, nw = token_grams(t, text_col, 1)
            pieces = []
            if len(toks):
                enc = toks.dictionary_encode()
                codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
                ndict = len(enc.dictionary)
                pair, tf = np.unique(doc_idx * ndict + codes, return_counts=True)
                rows = (pair // ndict).astype(np.int64)
                pieces.append(
                    pa.table(
                        {
                            id_col: t[id_col].take(pa.array(rows)),
                            "term": enc.dictionary.take(
                                pa.array((pair % ndict).astype(np.int64))
                            ),
                            "tf": pa.array(tf.astype(np.int64)),
                        }
                    )
                )
            # NULL-term anchor per ZERO-token doc: survives the left
            # join with logp NULL / tf 0, so empty docs keep their row
            z = np.flatnonzero(nw == 0)
            if z.size:
                pieces.append(
                    pa.table(
                        {
                            id_col: t[id_col].take(pa.array(z)),
                            "term": pa.nulls(z.size, pa.string()),
                            "tf": pa.array(np.zeros(z.size, dtype=np.int64)),
                        }
                    )
                )
            if not pieces:
                return pa.table(
                    {
                        id_col: pa.array([], type=id_type),
                        "term": pa.array([], type=pa.string()),
                        "tf": pa.array([], type=pa.int64()),
                    }
                )
            return pa.concat_tables(pieces)

        joined = ds.map_batches(
            tf_rows, batch_format="pyarrow", zero_copy_batch=True
        ).join(
            vocab_lp,
            join_type="left_outer",
            num_partitions=join_partitions(None),
            on=("term",),
            aggregator_ray_remote_args=join_remote_args(),
        )

        def fold_partial(t: pa.Table) -> pa.Table:
            tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
            lp = np.nan_to_num(
                t["logp"].to_numpy(zero_copy_only=False).astype(np.float64)
            )  # NULL logp only rides tf=0 anchor rows
            return pa.table(
                {
                    id_col: t[id_col],
                    "n_tokens": t["tf"],
                    "w": pa.array(tf * lp, type=pa.float64()),
                }
            )

        folded = bucketed_group_agg(
            joined.map_batches(fold_partial, batch_format="pyarrow"),
            id_col,
            [("n_tokens", "sum"), ("w", "sum")],
        )

        def finish(t: pa.Table) -> pa.Table:
            n = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
            w = t["w"].to_numpy(zero_copy_only=False).astype(np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                lp = np.where(n > 0, w / np.maximum(n, 1), np.nan)
            lp_col = pa.array(lp, type=pa.float64())
            lp_col = pc.if_else(
                pc.is_nan(lp_col), pa.scalar(None, pa.float64()), lp_col
            )
            return pa.table(
                {
                    id_col: t[id_col],
                    "n_tokens": pa.array(n),
                    "logprob": lp_col,
                }
            )

        return folded.map_batches(finish, batch_format="pyarrow")

    # broadcast route: bounded pull (<= max_broadcast_terms rows)
    vt = collect_arrow(vocab_ds)
    if len(vt) == 0:
        vt = pa.table(
            {"term": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )
    terms_ref = ray.put(vt["term"].combine_chunks())
    logp_ref = ray.put(
        np.log(vt["cnt"].to_numpy(zero_copy_only=False).astype(np.float64) / total)
        if len(vt)
        else np.zeros(0, dtype=np.float64)
    )

    def score(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[text_col]))
        toks, doc_idx, nw = token_grams(t, text_col, 1)
        tot = np.zeros(len(t), dtype=np.float64)
        if len(toks):
            idx = pc.index_in(toks, value_set=ray.get(terms_ref)).to_numpy(
                zero_copy_only=False
            )
            np.add.at(tot, doc_idx, ray.get(logp_ref)[idx.astype(np.int64)])
        n = nw.astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            lp = np.where(n > 0, tot / np.maximum(n, 1), np.nan)
        lp_col = pa.array(lp, type=pa.float64())
        lp_col = pc.if_else(
            pc.is_nan(lp_col), pa.scalar(None, pa.float64()), lp_col
        )
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": pa.array(n),
                "logprob": lp_col,
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Okapi BM25 scoring against a fixed query (retrieval-style curation)
# ---------------------------------------------------------------------------


def bm25_ds(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    query_terms,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Okapi BM25 score of every document against a fixed query — the
    standard Lucene-style formulation (Robertson–Spärck Jones idf with
    the +1 floor, so idf is always positive)::

        idf(t)   = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)
        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    N counts docs with non-null text; ``dl`` is the doc's whitespace
    token count (empty tokens dropped, str.split semantics); ``avgdl``
    the corpus mean. Docs matching no query term score 0; one output
    row per non-null-text doc.

    Shape (100 TB): the statistics pass prunes tokens to the QUERY'S
    OWN terms per batch before the bucketed combine, so the exchanged
    vocabulary is bounded by |query| — never the corpus vocabulary (the
    corpus-wide analog with the broadcast/term-join guard is
    ``tfidf_ds``); the N and total-token normalizers ride the same
    exchange as a NULL-term row. Scoring is embarrassingly parallel:
    tokens probe the query list with one ``pc.index_in``, per-(doc,
    term) tfs via ``np.unique``, contributions folded with one
    ``np.add.at``. Returns ``(id_col, n_tokens:int64, bm25:float64)``.
    """
    from ..runtime import bucketed_group_agg, collect_arrow

    from .dedup import token_grams

    qlist = sorted(set(query_terms))
    if not qlist:
        raise ValueError("bm25_ds: query_terms must be non-empty")
    nq = len(qlist)
    qarr = pa.array(qlist, type=pa.string())
    k1 = float(k1)
    b = float(b)

    _EMPTY_STATS = pa.table(
        {
            "term": pa.array([], type=pa.string()),
            "df": pa.array([], type=pa.int64()),
            "tok": pa.array([], type=pa.int64()),
        }
    )

    def stats_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[text_col]))
        n_docs = len(t)
        if n_docs == 0:
            return _EMPTY_STATS
        toks, doc_idx, nw = token_grams(t, text_col, 1)
        base = pa.table(
            {
                "term": pa.array([None], type=pa.string()),
                "df": pa.array([n_docs], type=pa.int64()),
                "tok": pa.array([int(nw.sum())], type=pa.int64()),
            }
        )
        if len(toks) == 0:
            return base
        idx = (
            pc.fill_null(pc.index_in(toks, value_set=qarr), -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        m = idx >= 0
        if not m.any():
            return base
        pair = np.unique(doc_idx[m] * nq + idx[m])
        dfc = np.bincount(pair % nq, minlength=nq).astype(np.int64)
        present = np.flatnonzero(dfc > 0)
        out = pa.table(
            {
                "term": qarr.take(pa.array(present)),
                "df": pa.array(dfc[present]),
                "tok": pa.array(np.zeros(present.size, dtype=np.int64)),
            }
        )
        return pa.concat_tables([out, base])

    st = collect_arrow(
        bucketed_group_agg(
            ds.map_batches(
                stats_partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            "term",
            [("df", "sum"), ("tok", "sum")],
            num_buckets=num_buckets,
        )
    )  # bounded: <= |query| + 1 rows by construction
    idf = np.zeros(nq, dtype=np.float64)
    n_total, tok_total = 0, 0
    if len(st):
        terms = st["term"].to_pylist()
        dfs = st["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        toksum = st["tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = {t: i for i, t in enumerate(qlist)}
        for trm, dfv, tkv in zip(terms, dfs, toksum):
            if trm is None:
                n_total, tok_total = int(dfv), int(tkv)
            else:
                idf[pos[trm]] = dfv  # stash df; idf computed below
        with np.errstate(divide="ignore", invalid="ignore"):
            idf = np.log((n_total - idf + 0.5) / (idf + 0.5) + 1.0)
    avgdl = (tok_total / n_total) if n_total and tok_total else 1.0

    def score(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[text_col]))
        toks, doc_idx, nw = token_grams(t, text_col, 1)
        n = nw.astype(np.int64)
        sc = np.zeros(len(t), dtype=np.float64)
        if len(toks):
            idx = (
                pc.fill_null(pc.index_in(toks, value_set=qarr), -1)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            m = idx >= 0
            if m.any():
                pair, tf = np.unique(doc_idx[m] * nq + idx[m], return_counts=True)
                pd_ = (pair // nq).astype(np.int64)
                pq_ = (pair % nq).astype(np.int64)
                tf = tf.astype(np.float64)
                dl = n[pd_].astype(np.float64)
                denom = tf + k1 * (1.0 - b + b * dl / avgdl)
                np.add.at(sc, pd_, idf[pq_] * tf * (k1 + 1.0) / denom)
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": pa.array(n),
                "bm25": pa.array(sc, type=pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)

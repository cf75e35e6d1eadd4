"""Local (no Ray session) units for the r5 runtime helpers:
ts_to_us_int64 unit normalization and compact_strings value identity."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vald.runtime import compact_strings, ts_to_us_int64


def test_ts_to_us_int64_units():
    base = np.datetime64("2024-01-02T03:04:05", "us").astype(np.int64)
    for unit in ("s", "ms", "us", "ns"):
        arr = pa.array([np.datetime64("2024-01-02T03:04:05", unit)]).cast(
            pa.timestamp(unit)
        )
        got = ts_to_us_int64(arr).to_pylist()
        assert got == [int(base)], unit


def test_ts_to_us_int64_tz_and_ints():
    arr = pa.array([1_700_000_000_000_000], type=pa.int64())
    assert ts_to_us_int64(arr).to_pylist() == [1_700_000_000_000_000]
    tz = pa.array([0], type=pa.timestamp("ns", tz="UTC"))
    assert ts_to_us_int64(tz).to_pylist() == [0]


def test_ts_to_us_int64_date():
    import datetime

    arr = pa.array([datetime.date(2024, 1, 2)], type=pa.date32())
    want = int(np.datetime64("2024-01-02T00:00:00", "us").astype(np.int64))
    assert ts_to_us_int64(arr).to_pylist() == [want]


def test_compact_strings_identity_and_fresh_buffers():
    vals = ["a b", "   ", None, "", "x" * 100]
    for src in (
        pa.array(vals, type=pa.string()),
        pa.chunked_array([vals[:2], vals[2:]], type=pa.string()),
        pa.array(vals, type=pa.string()).slice(1, 3),
    ):
        out = compact_strings(src)
        assert out.to_pylist() == (
            src.to_pylist() if not isinstance(src, pa.ChunkedArray) else vals
        )
    # sliced input: the output must NOT alias the input's buffers
    sliced = pa.array(vals, type=pa.string()).slice(1, 3)
    out = compact_strings(sliced)
    chunk = out.chunk(0) if isinstance(out, pa.ChunkedArray) else out
    assert chunk.offset == 0
    # split after compaction behaves like str.split on ws-only strings
    toks = pc.list_flatten(pc.utf8_split_whitespace(compact_strings(
        pa.array(["cat cat dog runs", "   "])
    )))
    assert [x for x in toks.to_pylist() if x] == ["cat", "cat", "dog", "runs"]

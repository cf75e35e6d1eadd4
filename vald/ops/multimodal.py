"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool map_batches stages.

The sandbox has no image/audio libraries, so the CODEC is a
deterministic fake (clearly marked): payloads are self-describing
byte blobs with a magic header; ``decode`` parses the header and
"samples" the body. Everything Ray-side — schema, batch sizing for
large binary rows, actor signature, output layout — is real and
tested, so swapping in a real codec (PIL / torchaudio) is a
one-function change (``_decode_payload``).

Memory note (SURVEY.md §4.3): binary payloads are large — these stages
default to small ``batch_size`` so batch × concurrency stays inside a
worker's heap; the object store spills the rest.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

import ray.data

__all__ = [
    "MEDIA_SCHEMA",
    "fake_media_dataset",
    "DecodeStage",
    "decode_media",
    "EmbedStage",
    "embed_media",
    "FrameSampleStage",
    "sample_frames",
]

_MAGIC = b"VMED"

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("meta_json", pa.string()),
    ]
)


def _encode_payload(kind: str, h: int, w: int, n_frames: int, seed: int, body_len: int) -> bytes:
    """FAKE codec (deterministic): header + pseudo-random body."""
    rng = np.random.RandomState(seed)
    body = rng.randint(0, 256, size=body_len, dtype=np.uint8).tobytes()
    header = _MAGIC + struct.pack("<4sIIII", kind[:4].ljust(4).encode(), h, w, n_frames, body_len)
    return header + body


def _decode_payload(payload: bytes) -> dict:
    """FAKE decode — replace with a real codec (PIL/av) off-sandbox.
    Raises ValueError on corrupt payloads (exercised in tests)."""
    if payload[:4] != _MAGIC:
        raise ValueError("bad magic: not a VMED payload")
    kind, h, w, n_frames, body_len = struct.unpack_from("<4sIIII", payload, 4)
    body = np.frombuffer(payload, dtype=np.uint8, offset=4 + struct.calcsize("<4sIIII"))
    if len(body) != body_len:
        raise ValueError("truncated payload")
    return {
        "kind": kind.decode().strip(),
        "height": int(h),
        "width": int(w),
        "n_frames": int(n_frames),
        "body": body,
    }


def fake_media_dataset(n: int, seed: int = 42, kind: str = "image") -> "ray.data.Dataset":
    """Deterministic synthetic media table (binary payloads ~4-64 KiB)."""

    def gen(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy(zero_copy_only=False)
        rows = {"media_id": [], "kind": [], "payload": [], "meta_json": []}
        import json

        for i in ids:
            i = int(i)
            h, w = 32 + (i * 7) % 96, 32 + (i * 13) % 96
            nf = 1 if kind == "image" else 1 + i % 16
            body_len = h * w * (3 if kind == "image" else 1) * nf
            rows["media_id"].append(i)
            rows["kind"].append(kind)
            rows["payload"].append(_encode_payload(kind, h, w, nf, seed + i, body_len))
            rows["meta_json"].append(json.dumps({"height": h, "width": w, "n_frames": nf}))
        return pa.Table.from_arrays(
            [
                pa.array(rows["media_id"], type=pa.int64()),
                pa.array(rows["kind"], type=pa.string()),
                pa.array(rows["payload"], type=pa.binary()),
                pa.array(rows["meta_json"], type=pa.string()),
            ],
            schema=MEDIA_SCHEMA,
        )

    return ray.data.range(n).map_batches(gen, batch_format="pyarrow")


class DecodeStage:
    """Actor: decode payload → dimensions + channel statistics.
    Bad payloads become rows in an ``decode_error`` column instead of
    failing the task (poison-pill tolerance)."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, t: pa.Table) -> pa.Table:
        hs, ws, nfs, means, errs = [], [], [], [], []
        for p in t[self.payload_col].to_pylist():
            try:
                d = _decode_payload(p)
                hs.append(d["height"])
                ws.append(d["width"])
                nfs.append(d["n_frames"])
                means.append(float(d["body"].mean()) if len(d["body"]) else 0.0)
                errs.append(None)
            except (ValueError, struct.error) as e:
                hs.append(None)
                ws.append(None)
                nfs.append(None)
                means.append(None)
                errs.append(str(e))
        t = t.drop_columns([self.payload_col])  # drop the heavy bytes ASAP
        t = t.append_column("height", pa.array(hs, type=pa.int32()))
        t = t.append_column("width", pa.array(ws, type=pa.int32()))
        t = t.append_column("n_frames", pa.array(nfs, type=pa.int32()))
        t = t.append_column("mean_value", pa.array(means, type=pa.float64()))
        return t.append_column("decode_error", pa.array(errs, type=pa.string()))


def decode_media(
    ds: "ray.data.Dataset",
    *,
    batch_size: int = 64,
    concurrency: int | tuple[int, int] = (1, 8),
) -> "ray.data.Dataset":
    return ds.map_batches(
        DecodeStage, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


class EmbedStage:
    """Actor: batched "model inference" — FAKE embedding = fixed
    projection of byte histograms (the projection matrix is the model
    weight, loaded once per actor in __init__ — the real-model pattern)."""

    def __init__(self, dim: int = 32, payload_col: str = "payload", seed: int = 7):
        rng = np.random.RandomState(seed)
        self.W = rng.standard_normal((256, dim)).astype(np.float32)  # "weights"
        self.payload_col = payload_col
        self.dim = dim

    def __call__(self, t: pa.Table) -> pa.Table:
        embs = np.zeros((len(t), self.dim), dtype=np.float32)
        for i, p in enumerate(t[self.payload_col].to_pylist()):
            try:
                d = _decode_payload(p)
                hist = np.bincount(d["body"], minlength=256).astype(np.float32)
                hist /= max(1.0, hist.sum())
                embs[i] = hist @ self.W
            except (ValueError, struct.error):
                pass
        t = t.drop_columns([self.payload_col])
        return t.append_column(
            "media_embedding",
            pa.FixedSizeListArray.from_arrays(
                pa.array(embs.reshape(-1), type=pa.float32()), self.dim
            ),
        )


def embed_media(
    ds: "ray.data.Dataset",
    *,
    dim: int = 32,
    batch_size: int = 64,
    concurrency: int | tuple[int, int] = (1, 8),
) -> "ray.data.Dataset":
    return ds.map_batches(
        EmbedStage,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampleStage:
    """Actor: sample every ``stride``-th frame of video payloads into
    one output row per sampled frame (flat_map-shaped: out rows ≥ in)."""

    def __init__(self, stride: int = 4, payload_col: str = "payload"):
        self.stride = stride
        self.payload_col = payload_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, frames, means = [], [], []
        for mid, p in zip(t["media_id"].to_pylist(), t[self.payload_col].to_pylist()):
            try:
                d = _decode_payload(p)
            except (ValueError, struct.error):
                continue
            frame_len = d["height"] * d["width"]
            for f in range(0, d["n_frames"], self.stride):
                chunk = d["body"][f * frame_len : (f + 1) * frame_len]
                ids.append(mid)
                frames.append(f)
                means.append(float(chunk.mean()) if len(chunk) else 0.0)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(frames, type=pa.int32()),
                "frame_mean": pa.array(means, type=pa.float64()),
            }
        )


def sample_frames(
    ds: "ray.data.Dataset",
    *,
    stride: int = 4,
    batch_size: int = 32,
    concurrency: int | tuple[int, int] = (1, 8),
) -> "ray.data.Dataset":
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool map_batches stages.

The sandbox has no image/audio libraries, so the default CODEC is a
deterministic fake (clearly marked): payloads are self-describing
byte blobs with a magic header; ``decode`` parses the header and
"samples" the body. Everything Ray-side — schema, batch sizing for
large binary rows, actor signature, output layout — is real and
tested. A REAL-codec escape hatch exists (``_load_real_codec``):
each stage try-imports PIL/cv2 once per actor and routes non-VMED
payloads through it; DecodeStage labels every row with the ``codec``
that decoded it, so an environment that ships PIL picks up real
image decoding with zero code change.

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
    "ResizeStage",
    "resize_media",
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


def _load_real_codec():
    """Real-codec escape hatch (VERDICT r3 item 7): try PIL then cv2 at
    stage init, return a decode callable with a ``codec_name`` attr, or
    None when neither is installed (this sandbox). Stages fall back to
    the fake VMED codec, so the same tests pass offline; a round-N
    environment that ships PIL/cv2 picks the real path up automatically
    for non-VMED payloads (real image bytes: PNG/JPEG/...)."""
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]

        def decode(payload: bytes) -> dict:
            img = Image.open(io.BytesIO(payload))
            arr = np.asarray(img)
            if arr.ndim == 0:
                raise ValueError("PIL decoded a zero-dim image")
            h, w = arr.shape[0], (arr.shape[1] if arr.ndim > 1 else 1)
            return {
                "kind": "image",
                "height": int(h),
                "width": int(w),
                "n_frames": 1,
                "body": np.ascontiguousarray(arr).reshape(-1).astype(np.uint8),
            }

        decode.codec_name = "pil"
        return decode
    except ImportError:
        pass
    try:
        import cv2  # type: ignore[import-not-found]

        def decode(payload: bytes) -> dict:
            arr = cv2.imdecode(
                np.frombuffer(payload, dtype=np.uint8), cv2.IMREAD_UNCHANGED
            )
            if arr is None:
                raise ValueError("cv2 could not decode payload")
            h, w = arr.shape[0], (arr.shape[1] if arr.ndim > 1 else 1)
            return {
                "kind": "image",
                "height": int(h),
                "width": int(w),
                "n_frames": 1,
                "body": np.ascontiguousarray(arr).reshape(-1).astype(np.uint8),
            }

        decode.codec_name = "cv2"
        return decode
    except ImportError:
        return None


def _decode_any(payload: bytes, real=None) -> "tuple[dict, str]":
    """Dispatch: VMED-magic payloads always take the fake codec (the
    deterministic synthetic format); anything else goes to the real
    codec when one is installed. Returns (decoded, codec_name)."""
    if payload[:4] == _MAGIC:
        return _decode_payload(payload), "vmed-fake"
    if real is not None:
        # Real codecs raise library-specific errors on corrupt payloads
        # (PIL.UnidentifiedImageError is an OSError subclass; cv2 can
        # raise cv2.error). Normalize ALL of them to ValueError so the
        # stages' poison-pill handling works in exactly the environment
        # the escape hatch targets (ADVICE r4).
        try:
            return real(payload), real.codec_name
        except Exception as e:
            raise ValueError(f"{real.codec_name} decode failed: {e}") from e
    raise ValueError("bad magic: not a VMED payload and no real codec installed")


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
    failing the task (poison-pill tolerance). The real codec (PIL/cv2)
    is resolved ONCE per actor in __init__ (B7 pattern); each row's
    ``codec`` column records which codec actually decoded it."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col
        self.real = _load_real_codec()

    def __call__(self, t: pa.Table) -> pa.Table:
        hs, ws, nfs, means, errs, codecs = [], [], [], [], [], []
        for p in t[self.payload_col].to_pylist():
            try:
                d, codec = _decode_any(p, self.real)
                hs.append(d["height"])
                ws.append(d["width"])
                nfs.append(d["n_frames"])
                means.append(float(d["body"].mean()) if len(d["body"]) else 0.0)
                errs.append(None)
                codecs.append(codec)
            except (ValueError, OSError, struct.error) as e:
                hs.append(None)
                ws.append(None)
                nfs.append(None)
                means.append(None)
                errs.append(str(e))
                codecs.append(None)
        t = t.drop_columns([self.payload_col])  # drop the heavy bytes ASAP
        t = t.append_column("height", pa.array(hs, type=pa.int32()))
        t = t.append_column("width", pa.array(ws, type=pa.int32()))
        t = t.append_column("n_frames", pa.array(nfs, type=pa.int32()))
        t = t.append_column("mean_value", pa.array(means, type=pa.float64()))
        t = t.append_column("codec", pa.array(codecs, type=pa.string()))
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
        self.real = _load_real_codec()

    def __call__(self, t: pa.Table) -> pa.Table:
        embs = np.zeros((len(t), self.dim), dtype=np.float32)
        for i, p in enumerate(t[self.payload_col].to_pylist()):
            try:
                d, _ = _decode_any(p, self.real)
                hist = np.bincount(d["body"], minlength=256).astype(np.float32)
                hist /= max(1.0, hist.sum())
                embs[i] = hist @ self.W
            except (ValueError, OSError, struct.error):
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
        self.real = _load_real_codec()

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, frames, means = [], [], []
        for mid, p in zip(t["media_id"].to_pylist(), t[self.payload_col].to_pylist()):
            try:
                d, _ = _decode_any(p, self.real)
            except (ValueError, OSError, struct.error):
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


class ResizeStage:
    """Actor: nearest-neighbour resize of each frame's pixel grid to
    ``(out_h, out_w)``, re-encoding the payload with updated header
    dims — the write side of the plumbing (decode → transform →
    re-encode), so downstream stages see a structurally valid payload.
    The resample itself is vectorized numpy fancy-indexing per payload
    (the FAKE-codec stand-in for PIL's ``Image.resize``); channels
    beyond the h×w grid (image RGB) resize per plane. Bad payloads are
    dropped with the same poison-pill tolerance as DecodeStage."""

    def __init__(self, out_h: int, out_w: int, payload_col: str = "payload"):
        self.out_h = out_h
        self.out_w = out_w
        self.payload_col = payload_col
        self.real = _load_real_codec()

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, kinds, payloads = [], [], []
        oh, ow = self.out_h, self.out_w
        for mid, kind, p in zip(
            t["media_id"].to_pylist(),
            t["kind"].to_pylist(),
            t[self.payload_col].to_pylist(),
        ):
            try:
                d, _ = _decode_any(p, self.real)
            except (ValueError, OSError, struct.error):
                continue
            h, w = d["height"], d["width"]
            if h == 0 or w == 0:
                continue
            planes = len(d["body"]) // (h * w) if h * w else 0
            if planes == 0:
                continue
            grid = d["body"][: planes * h * w].reshape(planes, h, w)
            ri = (np.arange(oh) * h // oh).astype(np.intp)
            ci = (np.arange(ow) * w // ow).astype(np.intp)
            out = grid[:, ri[:, None], ci[None, :]]
            header = _MAGIC + struct.pack(
                "<4sIIII",
                (d["kind"][:4].ljust(4)).encode(),
                oh,
                ow,
                d["n_frames"],
                out.size,
            )
            ids.append(mid)
            kinds.append(kind)
            payloads.append(header + out.tobytes())
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "kind": pa.array(kinds, type=pa.string()),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )


def resize_media(
    ds: "ray.data.Dataset",
    out_h: int,
    out_w: int,
    *,
    batch_size: int = 32,
    concurrency: int | tuple[int, int] = (1, 8),
) -> "ray.data.Dataset":
    """Resize stage wired like the other media stages: actor pool,
    SMALL batches (payload bytes dominate; batch × concurrency must fit
    the worker heap), binary in / binary out so stages compose
    (resize → decode → embed)."""
    return ds.map_batches(
        ResizeStage,
        fn_constructor_kwargs={"out_h": out_h, "out_w": out_w},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

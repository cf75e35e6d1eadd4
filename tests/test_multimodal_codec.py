"""Real-codec escape hatch (VERDICT r3 item 7): offline the stages use
the fake VMED codec and label rows accordingly; with a (stubbed) real
codec installed, non-VMED payloads decode through it and carry its
label; without one they poison-pill cleanly."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from vald.ops import multimodal as M


def _media_table(n=6):
    rows = {"media_id": [], "kind": [], "payload": [], "meta_json": []}
    for i in range(n):
        rows["media_id"].append(i)
        rows["kind"].append("image")
        rows["payload"].append(M._encode_payload("imag", 8, 8, 1, i, 8 * 8 * 3))
        rows["meta_json"].append("{}")
    return pa.Table.from_arrays(
        [
            pa.array(rows["media_id"], type=pa.int64()),
            pa.array(rows["kind"], type=pa.string()),
            pa.array(rows["payload"], type=pa.binary()),
            pa.array(rows["meta_json"], type=pa.string()),
        ],
        schema=M.MEDIA_SCHEMA,
    )


def test_offline_label_is_fake_codec(ray_session):
    out = M.decode_media(M.fake_media_dataset(40), concurrency=(1, 2)).to_pandas()
    assert len(out) == 40
    assert (out["decode_error"].isna()).all()
    assert set(out["codec"]) == {"vmed-fake"}


def test_non_vmed_payload_without_codec_poison_pills():
    t = _media_table(3)
    t = t.set_column(
        t.schema.get_field_index("payload"),
        "payload",
        pa.array([b"\x89PNG not really", t["payload"][1].as_py(), b""], type=pa.binary()),
    )
    out = M.DecodeStage()(t)
    errs = out["decode_error"].to_pylist()
    assert errs[0] is not None and "no real codec" in errs[0]
    assert errs[1] is None and out["codec"][1].as_py() == "vmed-fake"
    assert errs[2] is not None


def test_stubbed_real_codec_is_used_and_labeled(monkeypatch):
    def stub(payload: bytes) -> dict:
        if not payload.startswith(b"STUB"):
            raise ValueError("stub can't read this")
        return {
            "kind": "image",
            "height": 2,
            "width": 2,
            "n_frames": 1,
            "body": np.frombuffer(payload[4:8], dtype=np.uint8),
        }

    stub.codec_name = "stub-codec"
    monkeypatch.setattr(M, "_load_real_codec", lambda: stub)

    t = _media_table(2)
    t = t.set_column(
        t.schema.get_field_index("payload"),
        "payload",
        pa.array([b"STUB\x01\x02\x03\x04", t["payload"][1].as_py()], type=pa.binary()),
    )
    out = M.DecodeStage()(t)
    assert out["codec"].to_pylist() == ["stub-codec", "vmed-fake"]
    assert out["decode_error"].to_pylist() == [None, None]
    assert out["height"][0].as_py() == 2
    # embed/frame/resize stages share the dispatcher
    d, codec = M._decode_any(b"STUB\x01\x02\x03\x04", stub)
    assert codec == "stub-codec" and d["width"] == 2

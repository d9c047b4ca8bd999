"""Tests for the self-owned pyarrow-0.14 wire-format reader/writer
(data/arrow014.py) and the committed real-bytes fixtures — VERDICT r4
item 2: the migration path decodes actual 0.14-layout bytes with no
pyarrow installed, validated against modern pyarrow's V4-compatible
IPC reader (an independent Arrow C++ implementation of the format
family).
"""
from pathlib import Path

import numpy as np
import pytest

from emotiongestures_tpu.data.arrow014 import deserialize, serialize

FIXTURES = Path(__file__).resolve().parent / "fixtures"

try:
    import pyarrow as pa  # optional cross-validation oracle
except ImportError:  # pragma: no cover
    pa = None


def _roundtrip(obj):
    out = deserialize(serialize(obj))
    return out


def test_roundtrip_scalars_and_sequences():
    obj = ["s", 7, -3, 2.5, True, False, b"\x00\x01raw",
           [1, [2, ["deep", 0.5]]], ("a", 1), {"k": [1, 2], "j": "v"}]
    out = _roundtrip(obj)
    assert out == obj


def test_roundtrip_sets_sorted():
    # the writer sorts sets for deterministic fixture bytes
    assert _roundtrip({3, 1, 2}) == {1, 2, 3}


@pytest.mark.parametrize("dtype", ["float16", "float32", "float64",
                                   "int8", "int16", "int32", "int64",
                                   "uint8", "uint32"])
def test_roundtrip_ndarray_dtypes(dtype, rng):
    arr = (rng.randn(5, 7) * 10).astype(dtype)
    out = _roundtrip([arr, "tail"])
    np.testing.assert_array_equal(out[0], arr)
    assert out[0].dtype == arr.dtype
    assert out[1] == "tail"


def test_roundtrip_ndarray_0d_and_1d(rng):
    a0 = np.float32(3.25).reshape(())
    a1 = rng.randn(11).astype(np.float32)
    out = _roundtrip([a0, a1])
    np.testing.assert_array_equal(out[0], a0)
    np.testing.assert_array_equal(out[1], a1)


def test_roundtrip_beat_record_shapes(rng):
    obj = [
        [["hello", 0.1, 0.4], ["world", 0.5, 0.9]],
        rng.randn(60, 282).astype(np.float32),
        rng.randn(64000).astype(np.float32),
        rng.randn(128, 128).astype(np.float16),
        {"vid": "v", "eid": "1_wayne_0_66_66", "start_frame_no": 0,
         "end_frame_no": 60, "start_time": 0.0, "end_time": 4.0},
    ]
    out = _roundtrip(obj)
    assert out[0] == obj[0] and out[4] == obj[4]
    for i in (1, 2, 3):
        np.testing.assert_array_equal(out[i], obj[i])


# ---------------------------------------------------------------------------
# committed fixtures: the real-bytes decode contract
# ---------------------------------------------------------------------------


def test_fixture_beat_window_decodes():
    buf = (FIXTURES / "beat_window.arrow014").read_bytes()
    word_seq, pose_seq, audio, spectrogram, aux = deserialize(buf)
    assert [w for w, *_ in word_seq] == [
        "the", "quick", "brown", "fox", "jumps", "over", "a", "dog"]
    assert all(isinstance(t, float) for _, *ts in word_seq for t in ts)
    assert pose_seq.shape == (60, 282) and pose_seq.dtype == np.float32
    assert audio.shape == (64000,) and audio.dtype == np.float32
    assert spectrogram.shape == (128, 128)
    assert spectrogram.dtype == np.float16
    assert aux["eid"] == "1_wayne_0_66_66"
    assert aux["start_frame_no"] == 120 and aux["end_frame_no"] == 180
    assert aux["start_time"] == 8.0 and aux["end_time"] == 12.0


def test_fixture_ted_window_decodes():
    buf = (FIXTURES / "ted_window.arrow014").read_bytes()
    word_seq, pose_seq, vec_seq, audio, spectrogram, aux = \
        deserialize(buf)
    assert len(word_seq) == 4 and word_seq[3][0] == "kenobi"
    assert pose_seq.shape == (34, 10, 3)
    assert vec_seq.shape == (34, 9, 3)
    assert audio.shape == (36267,)
    assert spectrogram.shape == (128, 70)
    assert aux["vid"] == "yq3TQoMjXTw"


def test_fixture_bytes_reproducible():
    """The committed bytes are exactly what the (seeded) builder emits —
    anyone can regenerate and diff."""
    import sys

    sys.path.insert(0, str(FIXTURES))
    try:
        import make_arrow014_fixtures as mk
    finally:
        sys.path.pop(0)
    assert serialize(mk.beat_window()) == \
        (FIXTURES / "beat_window.arrow014").read_bytes()
    assert serialize(mk.ted_window()) == \
        (FIXTURES / "ted_window.arrow014").read_bytes()


def test_fixture_to_gesture_store(tmp_path):
    """End to end: real-format bytes -> window_record_from_serialized ->
    GestureStore -> SpeechMotionDataset.__getitem__ with the reference's
    documented tuple semantics (lmdb_loader_BEAT_full.py:171-253)."""
    from emotiongestures_tpu.data.dataset import SpeechMotionDataset
    from emotiongestures_tpu.data.store import (
        GestureStoreWriter, window_record_from_serialized)

    rec = window_record_from_serialized(
        (FIXTURES / "beat_window.arrow014").read_bytes())
    with GestureStoreWriter(tmp_path / "c") as w:
        w.append(rec)
    ds = SpeechMotionDataset(tmp_path / "c", use_cache_suffix=False)
    s = ds[0]
    assert s["pose_seq"].shape == (60, 282)
    assert s["audio"].shape == (ds.expected_audio_length,)
    assert s["spectrogram"].shape == (128, 124)  # cropped, f32
    assert s["spectrogram"].dtype == np.float32
    assert s["eid_label"][1] == 1.0  # eid 66 -> happiness bucket
    assert s["aux_info"]["start_frame_no"] == 120


# ---------------------------------------------------------------------------
# cross-validation against modern pyarrow (independent Arrow C++ reader
# with V4/legacy-format compatibility)
# ---------------------------------------------------------------------------


@pytest.mark.skipif(pa is None, reason="pyarrow not installed")
def test_stream_parses_with_pyarrow():
    buf = (FIXTURES / "beat_window.arrow014").read_bytes()
    reader = pa.ipc.open_stream(pa.BufferReader(buf[16:]))
    batch = reader.read_next_batch()
    assert batch.num_rows == 1
    wrapper = batch.column(0).to_pylist()[0]
    # column row 0 is the 1-element wrapper sequence holding the object
    assert len(wrapper) == 1 and len(wrapper[0]) == 5
    # the first field (word_seq) survives pyarrow's decode verbatim
    assert [w for w, *_ in wrapper[0][0]] == [
        "the", "quick", "brown", "fox", "jumps", "over", "a", "dog"]


@pytest.mark.skipif(pa is None, reason="pyarrow not installed")
def test_tensors_parse_with_pyarrow(rng):
    arrs = [rng.randn(3, 4).astype(np.float32),
            rng.randn(7).astype(np.float16),
            (rng.randn(2, 2) * 9).astype(np.int64)]
    buf = serialize(arrs)
    src = pa.BufferReader(buf[16:])
    r = pa.ipc.open_stream(src)
    r.read_next_batch()
    pos = 16 + src.tell()
    pos += (64 - pos % 64) % 64
    for expected in arrs:
        inner = pa.BufferReader(buf[pos:])
        t = pa.ipc.read_tensor(inner)
        np.testing.assert_array_equal(t.to_numpy(), expected)
        pos += inner.tell()
        pos += (64 - pos % 64) % 64


@pytest.mark.skipif(pa is None, reason="pyarrow not installed")
def test_v5_reencoded_stream_decodes(rng):
    """The reader also accepts V5 framing: round-trip the fixture's
    union batch through modern pyarrow's writer (V5 continuation
    markers, no union validity buffer) and splice it back into the
    serialize container."""
    import struct

    buf = (FIXTURES / "ted_window.arrow014").read_bytes()
    src = pa.BufferReader(buf[16:])
    reader = pa.ipc.open_stream(src)
    batch = reader.read_next_batch()
    stream_end = 16 + src.tell()
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, batch.schema) as w:
        w.write_batch(batch)
    v5_stream = sink.getvalue().to_pybytes()

    out = bytearray()
    out += buf[:16]  # original 0.14 header ints + padding
    out += v5_stream
    out += b"\x00" * ((64 - len(out) % 64) % 64)
    # skip the original EOS + alignment, then copy the tensor section
    tail = stream_end + ((64 - stream_end % 64) % 64)
    out += buf[tail:]
    got = deserialize(bytes(out))
    want = deserialize(buf)
    assert got[0] == want[0] and got[5] == want[5]
    for i in (1, 2, 3, 4):
        np.testing.assert_array_equal(got[i], want[i])

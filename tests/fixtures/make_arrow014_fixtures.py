"""Generate the committed pyarrow-0.14 wire-format fixtures:

  beat_window.arrow014   one BEAT 5-tuple cache record
                         (word_seq, pose_seq, audio, spectrogram,
                         aux_info) — lmdb_loader_BEAT_full.py:171-180
  ted_window.arrow014    one TED 6-tuple record (adds vec_seq) —
                         lmdb_data_loader.py:104-113

Bytes are hand-assembled by emotiongestures_tpu.data.arrow014.serialize
(the 0.14 ``SerializedPyObject`` layout: 3-int header, legacy-framed
union IPC stream, 64-aligned tensor blocks); tests/test_arrow014.py
cross-validates the stream and tensor sections against modern pyarrow's
V4-compatible reader. Deterministic content (seeded) at REAL record
shapes, so `python make_arrow014_fixtures.py` reproduces the committed
bytes exactly.
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from emotiongestures_tpu.data.arrow014 import serialize  # noqa: E402

HERE = Path(__file__).resolve().parent


def beat_window():
    rng = np.random.RandomState(20260819)
    words = ["the", "quick", "brown", "fox", "jumps", "over", "a", "dog"]
    starts = np.sort(rng.uniform(0.0, 3.6, len(words)))
    word_seq = [[w, float(s), float(s + 0.35)]
                for w, s in zip(words, starts)]
    pose_seq = (0.1 * rng.randn(60, 282)).astype(np.float32)
    audio = (0.3 * rng.randn(64000)).astype(np.float32)
    spectrogram = (20 * rng.rand(128, 128) - 60).astype(np.float16)
    aux_info = {
        "vid": "1_wayne_0_66_66",
        "eid": "1_wayne_0_66_66",
        "start_frame_no": 120,
        "end_frame_no": 180,
        "start_time": 8.0,
        "end_time": 12.0,
    }
    return [word_seq, pose_seq, audio, spectrogram, aux_info]


def ted_window():
    rng = np.random.RandomState(19700101)
    word_seq = [["hello", 0.2, 0.5], ["there", 0.6, 1.1],
                ["general", 1.4, 2.0], ["kenobi", 2.1, 2.9]]
    pose_seq = (0.1 * rng.randn(34, 10, 3)).astype(np.float32)
    vec_seq = (0.1 * rng.randn(34, 9, 3)).astype(np.float32)
    audio = (0.3 * rng.randn(36267)).astype(np.float32)
    spectrogram = (20 * rng.rand(128, 70) - 60).astype(np.float16)
    aux_info = {
        "vid": "yq3TQoMjXTw",
        "start_frame_no": 330,
        "end_frame_no": 364,
        "start_time": 13.2,
        "end_time": 14.56,
    }
    return [word_seq, pose_seq, vec_seq, audio, spectrogram, aux_info]


def main():
    for name, obj in (("beat_window", beat_window()),
                      ("ted_window", ted_window())):
        path = HERE / f"{name}.arrow014"
        path.write_bytes(serialize(obj))
        print(f"wrote {path} ({path.stat().st_size} bytes)")


if __name__ == "__main__":
    main()

"""DataPreprocessor / MotionPreprocessor tests against the reference's
window arithmetic (data_preprocessor.py:89-128)."""
import numpy as np
import pytest

from emotiongestures_tpu.data.preprocessing import (
    DataPreprocessor,
    MotionPreprocessor,
    get_words_in_time_range,
)
from emotiongestures_tpu.data.store import GestureStore, GestureStoreWriter


def _make_clip(rng, n_frames=150, fps=15, n_mels=128):
    duration = n_frames / fps
    # lively skeleton: 10 joints moving, upright spine
    t = np.arange(n_frames) / fps
    skel = np.zeros((n_frames, 10, 3))
    skel[:, 1, 1] = -0.5  # spine pointing down (towards -y)
    skel[:, 6, 0] = 0.3 * np.sin(2 * np.pi * 1.1 * t)
    skel[:, 9, 0] = 0.3 * np.cos(2 * np.pi * 0.9 * t)
    skel += 0.01 * rng.randn(*skel.shape)
    n_audio = int(duration * 16000)
    spec_len = int(round((n_audio - 1024) / 512 + 1))
    words = [[f"w{k}", 0.3 * k, 0.3 * k + 0.2] for k in range(30)]
    return {
        "skeletons_3d": skel.astype(np.float32),
        "audio_feat": rng.randn(n_mels, spec_len).astype(np.float32),
        "audio_raw": rng.randn(n_audio).astype(np.float32),
        "words": words,
        "aux_info": {
            "vid": "vid0",
            "eid": "1_wayne_0_66_66",
            "start_frame_no": 0,
            "end_frame_no": n_frames,
            "start_time": 0.0,
            "end_time": duration,
        },
    }


def test_preprocessor_windows(tmp_path, rng):
    clip_dir = tmp_path / "clips"
    with GestureStoreWriter(clip_dir) as w:
        w.append(_make_clip(rng))

    out_dir = tmp_path / "train_cache"
    pre = DataPreprocessor(clip_dir, out_dir, n_poses=60,
                           subdivision_stride=30, pose_resampling_fps=15)
    filtered, n = pre.run()
    # floor((150 - 60) / 30) + 1 = 4 windows
    assert n == 4
    store = GestureStore(out_dir)
    assert len(store) == 4
    rec = store[0]
    assert rec["pose_seq"].shape == (60, 10, 3)
    assert rec["audio"].shape == (64000,)
    assert rec["spectrogram"].shape == (128, 124)
    assert rec["aux_info"]["start_frame_no"] == 0
    assert store[1]["aux_info"]["start_frame_no"] == 30
    assert len(rec["word_seq"]) >= 2


def test_preprocessor_feeds_dataset(tmp_path, rng):
    """Cache written by the preprocessor loads through SpeechMotionDataset."""
    from emotiongestures_tpu.data.dataset import SpeechMotionDataset

    clip_dir = tmp_path / "clips"
    with GestureStoreWriter(clip_dir) as w:
        w.append(_make_clip(rng))
    DataPreprocessor(clip_dir, str(tmp_path / "train") + "_cache",
                     n_poses=60, subdivision_stride=30,
                     pose_resampling_fps=15).run()
    ds = SpeechMotionDataset(tmp_path / "train", n_poses=60,
                             subdivision_stride=30, pose_resampling_fps=15)
    sample = ds[0]
    assert sample["pose_seq"].shape == (60, 30)
    assert sample["spectrogram"].shape == (128, 124)
    assert sample["eid_label"].argmax() == 1  # eid index 66 -> happiness


def test_motion_filters(rng):
    mean_pose = np.zeros((10, 3))
    # static skeleton (arms frozen) -> 'motion'
    skel = np.zeros((60, 10, 3))
    skel[:, 1, 1] = -0.5
    skel[:, :, 0] += 1.0  # keep pose-diff above threshold
    out, msg = MotionPreprocessor(skel, mean_pose).get()
    assert msg == "motion" and out.size == 0
    # near-mean pose -> 'pose'
    skel2 = 0.001 * rng.randn(60, 10, 3)
    out, msg = MotionPreprocessor(skel2, mean_pose).get()
    assert msg == "pose"
    # tilted spine -> 'spine angle'
    skel3 = rng.randn(60, 10, 3)
    skel3[:, 0] = 0
    skel3[:, 1] = [1.0, 0.0, 0.0]  # horizontal spine
    out, msg = MotionPreprocessor(skel3, mean_pose).get()
    assert msg == "spine angle"
    # lively valid motion passes
    t = np.arange(60) / 15
    skel4 = np.zeros((60, 10, 3))
    skel4[:, 1, 1] = -0.5
    skel4[:, 6, 0] = 0.5 * np.sin(2 * np.pi * t) + 1
    skel4[:, 9, 0] = 0.5 * np.cos(2 * np.pi * t) + 1
    out, msg = MotionPreprocessor(skel4, mean_pose).get()
    assert msg == "PASS" and out.size > 0


def test_words_in_time_range():
    words = [["a", 0.0, 0.5], ["b", 0.6, 1.0], ["c", 1.5, 2.0]]
    got = get_words_in_time_range(words, 0.4, 1.2)
    assert [w[0] for w in got] == ["a", "b"]


def test_preprocessor_computed_frontends_match(tmp_path, rng):
    """spectrogram_frontend (VERDICT r4 item 8): computing the clip
    spectrogram from audio_raw via the numpy path and the fused Pallas
    kernel yields windows that agree with each other (and with the
    offline formula) to f16 resolution."""
    clip = _make_clip(rng)
    del clip["audio_feat"]  # a clip store without spectrograms
    clip_dir = tmp_path / "clips"
    with GestureStoreWriter(clip_dir) as w:
        w.append(clip)

    # 'precomputed' on a spec-less store must fail loudly
    pre_bad = DataPreprocessor(clip_dir, tmp_path / "bad_cache",
                               n_poses=60, subdivision_stride=30,
                               pose_resampling_fps=15)
    with pytest.raises(KeyError, match="audio_feat"):
        pre_bad.run()

    stores = {}
    for frontend in ("numpy", "pallas"):
        out = tmp_path / f"{frontend}_cache"
        pre = DataPreprocessor(clip_dir, out, n_poses=60,
                               subdivision_stride=30,
                               pose_resampling_fps=15,
                               spectrogram_frontend=frontend)
        pre._pallas_interpret = True  # CPU backend in tests
        _, n = pre.run()
        assert n == 4
        stores[frontend] = GestureStore(out)
    for i in range(4):
        a = stores["numpy"][i]["spectrogram"].astype(np.float32)
        b = stores["pallas"][i]["spectrogram"].astype(np.float32)
        assert a.shape == (128, 124)
        np.testing.assert_allclose(a, b, atol=0.08)

"""Mel frontend parity tests: JAX paths vs the numpy oracle, plus the
reference's length formulae (utils/train_utils_BEAT.py:186-226)."""
import numpy as np

from emotiongestures_tpu.ops import mel as M


def test_filterbank_shape_and_norm():
    fb = M.mel_filterbank()
    assert fb.shape == (128, 513)
    # every interior filter has positive area; slaney norm keeps peaks ~2/width
    assert (fb.sum(axis=1) > 0).all()
    # filters are band-limited triangles: each row is unimodal
    for row in fb[::16]:
        nz = np.flatnonzero(row)
        assert len(nz) > 0 and (np.diff(nz) == 1).all()


def test_slaney_mel_roundtrip():
    f = np.array([0.0, 200.0, 999.0, 1000.0, 4000.0, 8000.0])
    back = M._mel_to_hz_slaney(M._hz_to_mel_slaney(f))
    np.testing.assert_allclose(back, f, rtol=1e-10, atol=1e-8)


def test_xla_matches_numpy(rng):
    y = rng.randn(16000).astype(np.float32)
    ref = M._melspectrogram_np(y)
    got = np.asarray(M.melspectrogram(y))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_mxu_matches_numpy(rng):
    y = rng.randn(16000).astype(np.float32)
    ref = M._melspectrogram_np(y)
    got = np.asarray(M.melspectrogram_mxu(y))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=1e-3)


def test_power_to_db_matches_numpy(rng):
    S = np.abs(rng.randn(128, 124)).astype(np.float32) ** 2
    ref = M._power_to_db_np(S)
    got = np.asarray(M.power_to_db(S))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_full_pipeline_shape(rng):
    # 60 poses @ 15 fps -> 4 s -> 64000 samples -> 124 usable frames
    assert M.calc_spectrogram_length_from_motion_length(60, 15) == 124
    y = rng.randn(64000).astype(np.float32)
    spec = np.asarray(M.extract_melspectrogram(y))
    assert spec.dtype == np.float16
    assert spec.shape[0] == 128
    assert spec.shape[1] >= 124  # dataset slices to [:, :124]
    assert spec.max() <= 0.0 + 1e-3  # ref=max -> 0 dB peak
    assert spec.min() >= -80.0 - 1e-3  # top_db clamp


def test_make_audio_fixed_length(rng):
    y = rng.randn(100)
    assert len(M.make_audio_fixed_length(y, 150)) == 150
    assert len(M.make_audio_fixed_length(y, 50)) == 50
    np.testing.assert_array_equal(M.make_audio_fixed_length(y, 50), y[:50])


def test_constant_pad_mode_matches_numpy(rng):
    """librosa >=0.10 defaults to pad_mode='constant'; both modes must
    agree with the oracle."""
    y = rng.randn(8000).astype(np.float32)
    ref = M._melspectrogram_np(y, pad_mode="constant")
    got = np.asarray(M.melspectrogram(y, pad_mode="constant"))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)
    # and reflect vs constant genuinely differ at the edges
    got_reflect = np.asarray(M.melspectrogram(y, pad_mode="reflect"))
    assert not np.allclose(got, got_reflect)

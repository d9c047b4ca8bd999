"""Beat-alignment metric (model/Beat_score_v2.py:51-197) with a
self-owned, librosa-equivalent onset stack (librosa is not a dependency;
SURVEY.md §2.6 row 'librosa mel/onset').

Pipeline per clip (BeatAligner.load_audio):
  onset_strength : mel spectral flux — n_fft=2048, hop=512, 128 mels,
                   dB, positive first difference, mean over mels,
                   centered like librosa (lag + n_fft//(2*hop) shift)
  onset_detect   : peak_pick with librosa's default windows scaled by
                   sr/hop (pre_max 0.03s, pre_avg/post_avg 0.1s,
                   wait 0.03s, delta 0.07 on a max-normalised envelope)
  onset_backtrack: roll each onset to the preceding local minimum
  rms            : frame RMS from the STFT (scale-free for backtracking)

Pose side (load_pose): 8 limb groups from 6-d rotation slices
[18:42] and [150:174], velocity-norm local minima (order=2), exactly the
reference's slicing (Beat_score_v2.py:102-127 — including its quirk of
windowing only the right-side beats by [t_start, t_end]).

Score: GAHR soft recall exp(-d^2 / 2 sigma^2), averaged over
3 onset variants x 8 limbs / 24 (Beat_score_v2.py:182-193).
"""
from __future__ import annotations

import math

import numpy as np
from scipy.ndimage import maximum_filter1d
from scipy.signal import argrelextrema

from ..ops import mel as M

HOP = 512
N_FFT_ONSET = 2048
SR = 16000


def onset_strength(y: np.ndarray, sr: int = SR) -> np.ndarray:
    """Mel spectral flux, librosa.onset.onset_strength-equivalent."""
    S = M._melspectrogram_np(y, sr=sr, n_fft=N_FFT_ONSET, hop=HOP,
                             n_mels=128)
    S_db = M._power_to_db_np(S, top_db=None)
    lag = 1
    diff = S_db[:, lag:] - S_db[:, :-lag]
    env = np.maximum(0.0, diff).mean(axis=0)
    # librosa pads (lag + n_fft // (2 * hop)) zeros at the start and trims
    # to the original frame count so envelope frames align with time 0
    pad = lag + N_FFT_ONSET // (2 * HOP)
    env = np.concatenate([np.zeros(pad), env])[: S_db.shape[1]]
    return env


def peak_pick(x: np.ndarray, pre_max: int, post_max: int, pre_avg: int,
              post_avg: int, delta: float, wait: int) -> np.ndarray:
    """librosa.util.peak_pick-equivalent greedy peak detector."""
    if len(x) == 0:
        return np.array([], dtype=int)
    max_length = pre_max + post_max
    max_origin = int(np.ceil(0.5 * (pre_max - post_max)))
    mov_max = maximum_filter1d(x, max(max_length, 1), mode="constant",
                               origin=max_origin, cval=-np.inf)
    avg_length = pre_avg + post_avg
    avg_origin = int(np.ceil(0.5 * (pre_avg - post_avg)))
    if avg_length > 0:
        # librosa uses exact windowed mean with shrinking edges
        mov_avg = np.empty_like(x)
        n = len(x)
        for i in range(n):
            lo = max(0, i - pre_avg)
            hi = min(n, i + post_avg)
            mov_avg[i] = x[lo:hi].mean() if hi > lo else x[i]
    else:
        mov_avg = x.copy()
    peaks = []
    last = -1 - wait
    for i in range(len(x)):
        if x[i] != mov_max[i]:
            continue
        if x[i] < mov_avg[i] + delta:
            continue
        if i - last <= wait:
            continue
        peaks.append(i)
        last = i
    return np.asarray(peaks, dtype=int)


def onset_detect(onset_envelope: np.ndarray, sr: int = SR,
                 hop_length: int = HOP) -> np.ndarray:
    """librosa.onset.onset_detect(backtrack=False)-equivalent."""
    env = onset_envelope.astype(np.float64)
    if env.max() > 0:
        env = env / env.max()  # librosa normalize=True
    return peak_pick(
        env,
        pre_max=int(0.03 * sr // hop_length),
        post_max=int(0.00 * sr // hop_length + 1),
        pre_avg=int(0.10 * sr // hop_length),
        post_avg=int(0.10 * sr // hop_length + 1),
        delta=0.07,
        wait=int(0.03 * sr // hop_length),
    )


def onset_backtrack(events: np.ndarray, energy: np.ndarray) -> np.ndarray:
    """Roll each detected onset back to the preceding energy minimum
    (librosa.onset.onset_backtrack-equivalent)."""
    if len(events) == 0:
        return events
    minima = np.flatnonzero(
        (energy[1:-1] <= energy[:-2]) & (energy[1:-1] < energy[2:])
    ) + 1
    minima = np.concatenate([[0], minima])
    # for each event, the largest minimum <= event
    idx = np.searchsorted(minima, events, side="right") - 1
    return minima[np.maximum(idx, 0)]


def stft_rms(y: np.ndarray, n_fft: int = N_FFT_ONSET,
             hop: int = HOP) -> np.ndarray:
    """Frame RMS from the magnitude STFT (librosa.feature.rms(S=|S|))."""
    frames = M._frame_np(np.asarray(y, np.float64), n_fft, hop, True,
                         "reflect")
    win = M._hann_periodic(n_fft)
    spec = np.abs(np.fft.rfft(frames * win, axis=-1)) ** 2
    spec[:, 0] *= 0.5
    spec[:, -1] *= 0.5
    power = 2.0 * spec.sum(axis=1) / n_fft**2
    return np.sqrt(power)


def frames_to_time(frames, sr: int = SR, hop_length: int = HOP):
    return np.asarray(frames) * hop_length / sr


class BeatAligner:
    """alignment(sigma, order) (model/Beat_score_v2.py:51-197)."""

    def __init__(self, sigma: float = 0.3, order: int = 2):
        self.sigma = sigma
        self.order = order

    def load_audio(self, wave: np.ndarray, t_start: int = 0,
                   sr_audio: int = SR):
        short_y = np.asarray(wave, dtype=np.float64)[t_start * sr_audio:]
        oenv = onset_strength(short_y, sr_audio)
        onset_raw = onset_detect(oenv, sr_audio)
        onset_bt = onset_backtrack(onset_raw, oenv)
        rms = stft_rms(short_y)
        onset_bt_rms = onset_backtrack(onset_raw, rms)
        return onset_raw, onset_bt, onset_bt_rms

    def load_pose(self, pose: np.ndarray, t_start: int, t_end: int,
                  pose_fps: int = 15):
        """pose: (T, 282); returns 8 limb beat index arrays in the
        reference's order (right arm/shoulder/forearm/wrist, then left)."""
        data = np.concatenate([pose[:, 18:42], pose[:, 150:174]], axis=1)
        vel = data[1:, :] - data[:-1, :]

        def limb(lo):
            return np.linalg.norm(vel[:, lo : lo + 6], axis=1)

        v_r_shoulder, v_r_arm, v_r_forearm, v_r_wrist = (
            limb(0), limb(6), limb(12), limb(18))
        v_l_shoulder, v_l_arm, v_l_forearm, v_l_wrist = (
            limb(24), limb(30), limb(36), limb(42))

        def beats(v, windowed):
            vv = v[t_start * pose_fps : t_end * pose_fps] if windowed else v
            return argrelextrema(vv, np.less, order=self.order)[0]

        # reference windows only the right side (Beat_score_v2.py:115-126)
        return (
            beats(v_r_arm, True), beats(v_r_shoulder, True),
            beats(v_r_forearm, True), beats(v_r_wrist, True),
            beats(v_l_arm, False), beats(v_l_shoulder, False),
            beats(v_l_forearm, False), beats(v_l_wrist, False),
        )

    @staticmethod
    def motion_frames2time(frames, offset: float, pose_fps: int):
        return np.asarray(frames) / pose_fps + offset

    @staticmethod
    def GAHR(a, b, sigma: float) -> float:
        """Soft nearest-beat recall of b against a
        (Beat_score_v2.py:169-180)."""
        if len(b) == 0:
            return 0.0
        total = 0.0
        for b_each in b:
            l2_min = np.inf
            for a_each in a:
                l2_min = min(l2_min, abs(a_each - b_each))
            total += math.exp(-(l2_min**2) / (2 * sigma**2))
        return total / len(b)

    def calculate_align(self, onset_raw, onset_bt, onset_bt_rms,
                        pose_beats, pose_fps: int = 15) -> float:
        """pose_beats: the 8-tuple from load_pose. Average GAHR over
        3 onset sets x 8 limbs / 24 (Beat_score_v2.py:182-193)."""
        total = 0.0
        for audio_beat in (onset_raw, onset_bt, onset_bt_rms):
            audio_bt = frames_to_time(audio_beat)
            for pose_beat in pose_beats:
                pose_bt = self.motion_frames2time(pose_beat, 0, pose_fps)
                total += self.GAHR(pose_bt, audio_bt, self.sigma)
        return total / 24.0

    def score_batch(self, audio_batch: np.ndarray, pose_batch: np.ndarray,
                    t_start: int = 0, t_end: int = 4,
                    pose_fps: int = 15) -> float:
        """Mean alignment over a batch (the eval loop test_...py:243-250)."""
        total = 0.0
        for wave, pose in zip(audio_batch, pose_batch):
            onsets = self.load_audio(wave, t_start)
            beats = self.load_pose(pose, t_start, t_end, pose_fps)
            total += self.calculate_align(*onsets, beats, pose_fps)
        return total / len(audio_batch)


class BeatAlignerV1(BeatAligner):
    """Older 6-limb variant (model/Beat_score.py:51-191): slices
    [18:36]/[150:168], no forearm groups, and the final score uses ONLY
    RMS-backtracked onsets x the right wrist."""

    def load_pose(self, pose: np.ndarray, t_start: int, t_end: int,
                  pose_fps: int = 15):
        data = np.concatenate([pose[:, 18:36], pose[:, 150:168]], axis=1)
        vel = data[1:, :] - data[:-1, :]

        def limb(lo):
            return np.linalg.norm(vel[:, lo : lo + 6], axis=1)

        v_r_shoulder, v_r_arm, v_r_wrist = limb(0), limb(6), limb(12)
        v_l_shoulder, v_l_arm, v_l_wrist = limb(18), limb(24), limb(30)

        def beats(v, windowed):
            vv = v[t_start * pose_fps : t_end * pose_fps] if windowed else v
            return argrelextrema(vv, np.less, order=self.order)[0]

        return (beats(v_r_arm, True), beats(v_r_shoulder, True),
                beats(v_r_wrist, True), beats(v_l_arm, False),
                beats(v_l_shoulder, False), beats(v_l_wrist, False))

    def calculate_align(self, onset_raw, onset_bt, onset_bt_rms,
                        pose_beats, pose_fps: int = 15) -> float:
        """(Beat_score.py:188-191): onset_bt_rms vs right wrist only
        (pose_beats[2] in the load_pose return order)."""
        audio_bt = frames_to_time(onset_bt_rms)
        pose_bt = self.motion_frames2time(pose_beats[2], 0, pose_fps)
        return self.GAHR(pose_bt, audio_bt, self.sigma)


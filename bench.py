"""Benchmark: diverse gesture generation throughput on one chip.

Measures the eval entry point's device hot path (test_...py:191-248):
CVAE prior sampling + full generator forward, as ONE jitted function, and
reports generated gesture frames/sec/chip.

Measurement honesty (round-2 hardening — see BASELINE.md):
  * On this TPU-via-tunnel runtime, `block_until_ready` can return before
    execution and GC'd result buffers let the runtime cancel queued
    computations, so naive timing loops overstate throughput by ~100x.
    Every timed call therefore returns a scalar CHECKSUM over all model
    outputs; the checksums are stacked on device and fetched to host
    *inside the timed region* — a data dependency the runtime cannot
    cancel or reorder around.
  * Analytic FLOP count from XLA's own cost model
    (`compiled.cost_analysis()['flops']`) → implied TFLOP/s + MFU are
    printed, and MFU is asserted < 100% of the chip's bf16 peak.
  * Latency is asserted to GROW with batch size (a flat latency curve
    means dispatch is being measured, not compute).

Baseline (BASELINE.md): the PyTorch reference generator running on CPU,
imported straight from /root/reference (stubbed optional deps), measured
once and cached in BASELINE_measured.json. The CPU baseline uses batch 16
(its per-(batch,frame) python-loop memory module makes batch 1024
infeasible on CPU); batch sizes for both sides are recorded in the JSON.

Prints exactly one JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": R, ...}

Extra modes (for BASELINE.md rows, not the driver):
  python bench.py --train   # GAN train_step steps/s at the flagship config
  python bench.py --eval    # eval feature+metric device pipeline at batch 1024
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
BATCH = 1024  # serving batch
SMALL_BATCH = 128  # for the latency-grows-with-batch sanity check
FRAMES = 60
N_WORDS = 64
WARMUP = 3
ITERS = 20
ROUNDS = 3
BF16_PEAK_FLOPS = 197e12  # v5e MXU peak (bf16); fp32 achievable is lower
BASELINE_CACHE = REPO / "BASELINE_measured.json"
REFERENCE = Path(os.environ.get("EGTP_REFERENCE", "/root/reference"))


def _median(xs):
    return sorted(xs)[len(xs) // 2]


def _cost_flops(compiled) -> float | None:
    """XLA's analytic FLOP count for a compiled computation."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def timed_rounds(step, iters=ITERS, rounds=ROUNDS, warmup=WARMUP):
    """Median-of-rounds seconds/iteration for `step(i) -> scalar checksum`.

    The stack of all per-iteration checksums is fetched to host before the
    clock stops, forcing execution of every timed computation.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    warm = [step(i) for i in range(warmup)]
    total = float(jnp.stack(warm).sum())
    assert np.isfinite(total), f"non-finite warmup checksum: {total}"
    times = []
    for r in range(rounds):
        t0 = time.perf_counter()
        sums = [step((r + 1) * 1000 + i) for i in range(iters)]
        total = float(jnp.stack(sums).sum())  # host fetch INSIDE the clock
        times.append((time.perf_counter() - t0) / iters)
        assert np.isfinite(total), f"non-finite checksum: {total}"
    return _median(times)


def _build_forward(batch, precision="bf16", fused=True):
    """Flagship diverse-forward step. The default serving configuration is
    bf16 params/activations + the fused Pallas attention sublayer — the
    honest round-2 matrix (BASELINE.md) measured it 1.58x faster than
    fp32/plain with max abs pose-output error 0.003 (signal mean |x| 0.095)
    and 100% emotion-argmax agreement. fp32 remains the torch-parity path
    (tests/test_torch_parity.py); select it with --fp32."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from emotiongestures_tpu.core import precision as prec
    from emotiongestures_tpu.models import EmotionCVAEv3, GestureTransformer

    rng = np.random.RandomState(0)
    gen = GestureTransformer(n_words=N_WORDS, frames=FRAMES,
                             fused_attention=fused)
    vae = EmotionCVAEv3()
    spec = jnp.asarray(rng.randn(batch, 128, 124), jnp.float32)
    text = jnp.asarray(rng.randint(0, N_WORDS, (batch, FRAMES)))
    prior = jnp.asarray(rng.randn(batch, 10, 282), jnp.float32)
    y = jax.nn.one_hot(jnp.arange(batch) % 8, 8)
    gvars = gen.init(jax.random.PRNGKey(0), spec, text, prior)
    vvars = vae.init(
        {"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(2)},
        jnp.zeros((1, 60, 512), jnp.float32), jnp.zeros((1, 8), jnp.float32))
    if precision == "bf16":
        gvars = prec.bf16_variables(gvars)
        vvars = prec.cast_tree(vvars, jnp.bfloat16)
        spec, prior, y = prec.bf16_inputs(spec, prior, y)

    @jax.jit
    def diverse_forward(gv, vv, spec, text, prior, y, key):
        sampled = vae.apply(vv, y, method="sample", rngs={"sample": key})
        outs = gen.apply(gv, spec, text, prior, sampled, train=False)
        # checksum over EVERY output so nothing is dead-code-eliminated
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    args = (gvars, vvars, spec, text, prior, y)
    flops = _cost_flops(
        diverse_forward.lower(*args, jax.random.PRNGKey(0)).compile())

    def step(i):
        return diverse_forward(*args, jax.random.PRNGKey(i))

    return step, flops


def bench_jax(precision="bf16", fused=True) -> dict:
    import jax

    dev = jax.devices()[0]
    # sanity probe at a small batch: latency must grow with batch size
    small_step, _ = _build_forward(SMALL_BATCH, precision, fused)
    dt_small = timed_rounds(small_step)
    step, flops = _build_forward(BATCH, precision, fused)
    dt = timed_rounds(step)

    ratio = dt / dt_small
    assert ratio > 2.0, (
        f"latency flat across batch {SMALL_BATCH}->{BATCH} "
        f"(x{ratio:.2f}): measuring dispatch, not compute")
    implied = flops / dt if flops else None
    mfu = implied / BF16_PEAK_FLOPS if implied else None
    if mfu is not None:
        assert mfu < 1.0, (
            f"implied {implied / 1e12:.1f} TFLOP/s exceeds chip peak "
            f"({BF16_PEAK_FLOPS / 1e12:.0f}): measurement is broken")
    print(
        f"[bench] jax: {dt * 1e3:.2f} ms/batch{BATCH} "
        f"({dt_small * 1e3:.2f} ms/batch{SMALL_BATCH}, x{ratio:.1f}) on "
        f"{dev.device_kind}; "
        + (f"{flops / 1e9:.1f} GFLOP/batch -> {implied / 1e12:.1f} TFLOP/s, "
           f"MFU {mfu * 100:.1f}% of bf16 peak" if flops else "no cost model"),
        file=sys.stderr)
    return {
        "frames_per_sec": BATCH * FRAMES / dt,
        "ms_per_batch": dt * 1e3,
        "batch": BATCH,
        "implied_tflops": round(implied / 1e12, 2) if implied else None,
        "mfu_vs_bf16_peak": round(mfu, 4) if mfu else None,
        "precision": precision,
        "fused_attention": fused,
    }


def bench_torch_reference() -> float | None:
    """Measure the actual PyTorch reference generator on CPU (the
    reference's only non-CUDA fallback). Returns frames/sec or None."""
    try:
        import types

        import torch

        sys.path.insert(0, str(REFERENCE))
        # stub optional deps the reference imports but never calls
        for mod in ("torch_dct",):
            if mod not in sys.modules:
                sys.modules[mod] = types.ModuleType(mod)
        from Full_model.Models_memory import Transformer  # noqa: E402

        args = types.SimpleNamespace(
            dropout_prob=0.1, freeze_wordembed=False, hidden_size=300,
            n_layers=3, wordembed_dim=300, chunk=10)
        lang_model = types.SimpleNamespace(
            n_words=N_WORDS, word_embedding_weights=None)
        model = Transformer(
            args, lang_model, frames=FRAMES, pose_dim=282, prior_frames=10,
            d_word_vec=512, d_model=512, d_inner=2048, n_layers=3, n_head=8,
            d_k=64, d_v=64)
        model.eval()
        # CPU batch is smaller: the python-loop memory module is O(B*chunk)
        b = 16
        spec = torch.randn(b, 128, 124)
        text = torch.randint(0, N_WORDS, (b, FRAMES))
        prior = torch.randn(b, 10, 282)
        sampled = torch.randn(b, FRAMES, 512)
        with torch.no_grad():
            model(spec, text, prior, sampled)  # warmup
            t0 = time.perf_counter()
            n = 3
            for _ in range(n):
                model(spec, text, prior, sampled)
            dt = (time.perf_counter() - t0) / n
        print(f"[bench] torch reference: {dt * 1e3:.2f} ms/batch{b} on CPU",
              file=sys.stderr)
        return b * FRAMES / dt
    except Exception as e:  # pragma: no cover
        print(f"[bench] torch baseline failed: {e}", file=sys.stderr)
        return None
    finally:
        if str(REFERENCE) in sys.path:
            sys.path.remove(str(REFERENCE))


def get_baseline() -> float | None:
    if BASELINE_CACHE.exists():
        try:
            return json.loads(BASELINE_CACHE.read_text())[
                "torch_cpu_frames_per_sec"]
        except Exception:
            pass
    fps = bench_torch_reference()
    if fps is not None:
        BASELINE_CACHE.write_text(json.dumps(
            {"torch_cpu_frames_per_sec": fps,
             "batch": 16, "note": "reference Models_memory.Transformer, "
             "CPU, eval mode, with sampled emotion feature"}))
    return fps


def _train_bench_at(batch, cfg, iters=10, rounds=3, warmup=2):
    """(seconds/step, cost-model FLOPs/step) for the GAN train_step at
    one batch size, honest harness (checksum fetched inside the clock)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from emotiongestures_tpu.train import gan

    gs, ds = gan.create_states(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch_d = {
        "spectrogram": jnp.asarray(rng.randn(batch, 128, 124), jnp.float32),
        "text": jnp.asarray(rng.randint(0, N_WORDS, (batch, FRAMES))),
        "pose_seq": jnp.asarray(rng.randn(batch, FRAMES, 282), jnp.float32),
        "eid_label": jax.nn.one_hot(jnp.arange(batch) % 8, 8),
    }
    # cost-model FLOPs from the composite G+D update — lower BEFORE the
    # first execution (train_step donates the states)
    flops = _cost_flops(
        gan.train_step.lower(gs, ds, batch_d, jax.random.PRNGKey(1), cfg,
                             use_disc=True).compile())

    def step_fn(gs, ds, key):
        return gan.train_step(gs, ds, batch_d, key, cfg, use_disc=True)

    gs, ds, m = step_fn(gs, ds, jax.random.PRNGKey(1))  # warmup/compile

    def step(i):
        nonlocal gs, ds
        gs, ds, m = step_fn(gs, ds, jax.random.PRNGKey(i))
        return m["g_loss"] + m["d_loss"]

    dt = timed_rounds(step, iters=iters, rounds=rounds, warmup=warmup)
    return dt, flops


def bench_train_step(batch=128, compute_dtype="float32",
                     update_order="d_first", remat_audio=False,
                     d_concat_batch=False, grad_dtype="float32") -> dict:
    """GAN train_step (G+D updates) steps/s at the flagship config, with
    the same honesty guards as the flagship bench (VERDICT r2 item 5):
    cost-model FLOPs -> implied TFLOP/s, MFU asserted < chip peak, and
    latency asserted to grow with batch (2x batch must cost >1.5x).
    `compute_dtype="bfloat16"` benches the mixed-precision policy
    (fp32 master params/optimizer, bf16 forward/backward);
    `update_order="g_first"` the shared-forward ordering."""
    from emotiongestures_tpu.train import gan

    cfg = gan.GANConfig(n_words=N_WORDS, compute_dtype=compute_dtype,
                        update_order=update_order, remat_audio=remat_audio,
                        d_concat_batch=d_concat_batch,
                        grad_dtype=grad_dtype)
    dt, flops = _train_bench_at(batch, cfg)
    dt2, _ = _train_bench_at(batch * 2, cfg, iters=5, rounds=2, warmup=1)
    ratio = dt2 / dt
    assert ratio > 1.5, (
        f"train latency flat across batch {batch}->{batch * 2} "
        f"(x{ratio:.2f}): measuring dispatch, not compute")
    implied = flops / dt if flops else None
    mfu = implied / BF16_PEAK_FLOPS if implied else None
    if mfu is not None:
        assert mfu < 1.0, (
            f"implied {implied / 1e12:.1f} TFLOP/s exceeds chip peak: "
            "measurement is broken")
    print(f"[bench] train_step[{compute_dtype},{update_order}]: "
          f"{dt * 1e3:.1f} ms/step at batch {batch} "
          f"({batch / dt:.0f} samples/s; batch x2 -> x{ratio:.2f} latency)"
          + (f"; {flops / 1e9:.1f} GFLOP/step -> {implied / 1e12:.1f} "
             f"TFLOP/s, MFU {mfu * 100:.1f}% of bf16 peak" if flops
             else "; no cost model"),
          file=sys.stderr)
    return {"ms_per_step": dt * 1e3, "batch": batch,
            "samples_per_sec": batch / dt,
            "batch_scaling_x2": round(ratio, 2),
            "implied_tflops": round(implied / 1e12, 2) if implied else None,
            "mfu_vs_bf16_peak": round(mfu, 4) if mfu else None,
            "compute_dtype": compute_dtype, "update_order": update_order}


def bench_mel_frontend(n_clips: int = 64, clip_s: float = 10.0) -> dict:
    """Preprocessing mel-frontend throughput (VERDICT r4 item 8): the
    host numpy path vs the XLA device path vs the fused Pallas
    FFT+filterbank kernel, on `n_clips` clips of `clip_s` seconds.
    Device paths are honest: the spectrograms are fetched back to host
    numpy (the preprocessor's consumption), which forces execution AND
    charges the tunnel transfer both ways."""
    import numpy as np

    from emotiongestures_tpu.ops import mel as M

    rng = np.random.RandomState(0)
    n = int(clip_s * 16000)
    waves = rng.randn(n_clips, n).astype(np.float32)

    def rate(fn, reps=3):
        fn(waves[:2])  # warm/compile
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(waves)
            assert isinstance(out, np.ndarray) and out.ndim == 3
        return n_clips * reps / (time.perf_counter() - t0)

    def numpy_fn(w):
        return np.stack([M._power_to_db_np(M._melspectrogram_np(x))
                         .astype(np.float16) for x in w])

    def xla_fn(w):
        import jax.numpy as jnp

        out = M.batched_log_melspectrogram(jnp.asarray(w))
        return np.asarray(out.astype(jnp.float16))

    def pallas_fn(w):
        import jax.numpy as jnp

        from emotiongestures_tpu.ops.pallas_mel import \
            batched_melspectrogram_pallas

        mel = batched_melspectrogram_pallas(jnp.asarray(w))
        return np.asarray(M.power_to_db(mel).astype(jnp.float16))

    r_np = rate(numpy_fn)
    r_xla = rate(xla_fn)
    r_pl = rate(pallas_fn)
    best = max(("numpy", r_np), ("xla", r_xla), ("pallas", r_pl),
               key=lambda kv: kv[1])
    print(f"[bench] mel frontend ({n_clips} x {clip_s:.0f}s clips): "
          f"numpy {r_np:.1f} clips/s | xla {r_xla:.1f} | pallas "
          f"{r_pl:.1f} -> best: {best[0]}", file=sys.stderr)
    return {"n_clips": n_clips, "clip_seconds": clip_s,
            "numpy_clips_per_s": round(r_np, 1),
            "xla_clips_per_s": round(r_xla, 1),
            "pallas_clips_per_s": round(r_pl, 1),
            "best": best[0]}


def bench_stage3(batch=1024) -> dict:
    """Serving SoL experiment (VERDICT r4 item 5): race XLA's conv
    emitter against GEMM formulations of the same math on the two
    weakest entries of the serving SoL table (BASELINE.md):

      (a) stage 3 of the audio SE-ResNet — 6 blocks, C=128, 32x31
          spatial, measured 59% MFU. Every stride-1 3x3 conv is swapped
          for ops/conv_gemm's tap-GEMM or im2col formulation (exact same
          HWIO kernels, zero-padded SAME borders; parity asserted here
          before timing).
      (b) the encoder head (final conv 128->60 + BN + per-frame flatten
          + fc(992->512) + fc(512->512)) — measured 14% MFU, conv
          lane-bound at 60/128. Probes: tap-GEMM with the eval-mode BN
          folded into the conv kernel, and the same with the conv's
          output channels zero-padded 60->128 so the GEMM fills all MXU
          lanes (2.13x FLOPs for a possibly-much-better rate).

    All variants run eval-mode bf16 at the serving batch under the
    honest harness. Accept/reject on the printed numbers (BASELINE.md).
    """
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from emotiongestures_tpu.core.layers import BatchNorm, Conv, Linear
    from emotiongestures_tpu.nn.resnet_se import SEBasicBlock
    from emotiongestures_tpu.ops.conv_gemm import (conv3x3_im2col,
                                                   conv3x3_taps)

    # ---- (a) stage-3 stack ------------------------------------------
    class _Stage3(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = SEBasicBlock(128, stride=2, has_downsample=True,
                             train=False, name="b0")(x)
            for i in range(1, 6):
                x = SEBasicBlock(128, train=False, name=f"b{i}")(x)
            return x

    rng = np.random.RandomState(0)
    x3 = jnp.asarray(rng.randn(batch, 64, 62, 64), jnp.bfloat16)
    stage = _Stage3()
    variables = stage.init(jax.random.PRNGKey(0), x3)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16), variables["params"])
    bstats = variables["batch_stats"]

    def bn_eval(x, p, s):
        inv = lax.rsqrt(s["var"].astype(jnp.float32) + 1e-5)
        scale = (p["scale"].astype(jnp.float32) * inv).astype(x.dtype)
        bias = (p["bias"].astype(jnp.float32)
                - s["mean"].astype(jnp.float32) * p["scale"].astype(
                    jnp.float32) * inv).astype(x.dtype)
        return x * scale + bias

    def se_gate(x, p):
        y = jnp.mean(x, axis=(1, 2))
        y = nn.relu(y @ p["fc1"]["kernel"] + p["fc1"]["bias"])
        y = nn.sigmoid(y @ p["fc2"]["kernel"] + p["fc2"]["bias"])
        return x * y[:, None, None, :]

    def block_fwd(p, s, x, conv3x3, stride=1, down=False):
        def conv(x, w, stride):
            if stride == 1 and w.shape[:2] == (3, 3):
                return conv3x3(x, w)
            # explicit pad-1 for 3x3 (flax padding=1 semantics — NOT
            # lax "SAME" under stride 2), pad-0 for the 1x1 downsample
            pad = (1, 1) if w.shape[0] == 3 else (0, 0)
            return lax.conv_general_dilated(
                x, w, (stride, stride), (pad, pad),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = conv(x, p["conv1"]["Conv_0"]["kernel"], stride)
        out = nn.relu(out)
        out = bn_eval(out, p["bn1"]["BatchNorm_0"], s["bn1"]["BatchNorm_0"])
        out = conv(out, p["conv2"]["Conv_0"]["kernel"], 1)
        out = bn_eval(out, p["bn2"]["BatchNorm_0"], s["bn2"]["BatchNorm_0"])
        out = se_gate(out, p["se"])
        if down:
            res = conv(x, p["downsample_conv"]["Conv_0"]["kernel"], stride)
            res = bn_eval(res, p["downsample_bn"]["BatchNorm_0"],
                          s["downsample_bn"]["BatchNorm_0"])
        else:
            res = x
        return nn.relu(out + res)

    def stage_fwd(params, bstats, x, conv3x3):
        x = block_fwd(params["b0"], bstats["b0"], x, conv3x3,
                      stride=2, down=True)
        for i in range(1, 6):
            x = block_fwd(params[f"b{i}"], bstats[f"b{i}"], x, conv3x3)
        return x

    def conv3x3_xla(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # parity before timing (flax apply vs every pure impl) — each check
    # jitted whole: eager op-by-op dispatch through the tunnel's ~0.4 s
    # per-call latency takes tens of minutes for the same math
    ref_out = jax.jit(stage.apply)(variables, x3[:8])
    for name, impl in [("xla", conv3x3_xla), ("taps", conv3x3_taps),
                       ("im2col", conv3x3_im2col)]:
        got = jax.jit(lambda p, s, x, impl=impl: stage_fwd(p, s, x, impl))(
            params, bstats, x3[:8].astype(jnp.bfloat16))
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref_out.astype(jnp.float32))))
        scale_ = float(jnp.max(jnp.abs(ref_out.astype(jnp.float32)))) or 1.0
        assert err / scale_ < 0.05, f"stage3 {name} parity: {err} vs {scale_}"

    rows = {}
    for name, impl in [("xla", conv3x3_xla), ("taps", conv3x3_taps),
                       ("im2col", conv3x3_im2col)]:
        fn = jax.jit(lambda p, s, x, impl=impl:
                     jnp.sum(stage_fwd(p, s, x, impl).astype(jnp.float32)))
        flops = _cost_flops(fn.lower(params, bstats, x3).compile())
        dt = timed_rounds(lambda i, f=fn: f(params, bstats, x3),
                          iters=10, rounds=3, warmup=2)
        rows[name] = {"ms": round(dt * 1e3, 2),
                      "gflops": round(flops / 1e9, 1) if flops else None,
                      "tflops": round(flops / dt / 1e12, 1) if flops else None}
        print(f"[stage3] {name}: {dt * 1e3:.2f} ms "
              f"({rows[name]['tflops']} TFLOP/s)", file=sys.stderr)

    # ---- (b) head ----------------------------------------------------
    class _Head(nn.Module):
        @nn.compact
        def __call__(self, x):
            B = x.shape[0]
            x = Conv(FRAMES, (3, 3), padding=1, name="final_conv1")(x)
            x = BatchNorm(use_running_average=True, name="bn1")(x)
            x = jnp.transpose(x, (0, 3, 1, 2)).reshape(B, FRAMES, -1)
            x = Linear(512, name="fc1")(x)
            x = Linear(512, name="fc2")(x)
            return x

    xh = jnp.asarray(rng.randn(batch, 32, 31, 128), jnp.bfloat16)
    head = _Head()
    hvars = head.init(jax.random.PRNGKey(1), xh)
    hp = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16), hvars["params"])
    hs = hvars["batch_stats"]

    # fold eval-mode BN into the conv kernel/bias (exact)
    wc = hp["final_conv1"]["Conv_0"]["kernel"].astype(jnp.float32)
    bc = hp["final_conv1"]["Conv_0"]["bias"].astype(jnp.float32)
    bnp_, bns_ = hvars["params"]["bn1"]["BatchNorm_0"], \
        hs["bn1"]["BatchNorm_0"]
    inv = 1.0 / np.sqrt(np.asarray(bns_["var"], np.float64) + 1e-5)
    g = np.asarray(bnp_["scale"], np.float64) * inv
    w_fold = jnp.asarray(wc * g[None, None, None, :], jnp.bfloat16)
    b_fold = jnp.asarray(
        (bc - np.asarray(bns_["mean"], np.float64)) * g
        + np.asarray(bnp_["bias"], np.float64), jnp.bfloat16)
    w_pad = jnp.pad(w_fold, ((0, 0), (0, 0), (0, 0), (0, 128 - FRAMES)))
    b_pad = jnp.pad(b_fold, (0, 128 - FRAMES))

    def head_fcs(a, B):  # (B, 32, 31, FRAMES) -> fc2 output
        a = jnp.transpose(a, (0, 3, 1, 2)).reshape(B, FRAMES, -1)
        a = a @ hp["fc1"]["kernel"] + hp["fc1"]["bias"]
        return a @ hp["fc2"]["kernel"] + hp["fc2"]["bias"]

    def head_flax(x):
        return head.apply(hvars, x)

    def head_taps(x):
        return head_fcs(conv3x3_taps(x, w_fold) + b_fold, x.shape[0])

    def head_padded(x):
        a = conv3x3_taps(x, w_pad) + b_pad
        return head_fcs(a[..., :FRAMES], x.shape[0])

    ref_h = jax.jit(head_flax)(xh[:8])
    for name, fn in [("taps_fold", head_taps), ("taps_pad128", head_padded)]:
        err = float(jnp.max(jnp.abs(jax.jit(fn)(xh[:8]).astype(jnp.float32)
                                    - ref_h.astype(jnp.float32))))
        scale_ = float(jnp.max(jnp.abs(ref_h.astype(jnp.float32)))) or 1.0
        assert err / scale_ < 0.05, f"head {name} parity: {err} vs {scale_}"

    hrows = {}
    for name, fn in [("flax", head_flax), ("taps_fold", head_taps),
                     ("taps_pad128", head_padded)]:
        jf = jax.jit(lambda x, f=fn: jnp.sum(f(x).astype(jnp.float32)))
        flops = _cost_flops(jf.lower(xh).compile())
        dt = timed_rounds(lambda i, f=jf: f(xh),
                          iters=10, rounds=3, warmup=2)
        hrows[name] = {"ms": round(dt * 1e3, 2),
                       "gflops": round(flops / 1e9, 1) if flops else None,
                       "tflops": round(flops / dt / 1e12, 1) if flops
                       else None}
        print(f"[head] {name}: {dt * 1e3:.2f} ms "
              f"({hrows[name]['tflops']} TFLOP/s)", file=sys.stderr)
    return {"batch": batch, "stage3": rows, "head": hrows}


def bench_sol_train(batch=128) -> dict:
    """Train-step speed-of-light audit (VERDICT r3 item 8): jit each
    SE-ResNet stage's forward+backward in ISOLATION (bf16 compute, train
    mode, flagship train batch) with the honest harness, and bound each
    against the MXU lane ceiling — a C_out-channel conv cannot exceed
    C_out/128 of peak because the conv emitter maps output channels to
    the 128 MXU lanes, and the same mapping caps BOTH backward convs
    (dgrad emits C_in=C_out channels; wgrad's output matmul dimension is
    C_out). The per-stage bounds combine into a lane-aware SoL for the
    whole train step: SoL_ms = sum(stage_flops / stage_ceiling) +
    rest_flops / peak, which answers whether the measured step (29.8%
    MFU, BASELINE.md) is at its ceiling like serving's 40.1% or has a
    kernel-level lever left."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from emotiongestures_tpu.nn.resnet_se import SEBasicBlock

    class _Stage(nn.Module):
        planes: int
        blocks: int
        stride: int
        in_planes: int

        @nn.compact
        def __call__(self, x):
            x = SEBasicBlock(
                self.planes, stride=self.stride,
                has_downsample=(self.stride != 1
                                or self.in_planes != self.planes),
                train=True, name="b0")(x)
            for i in range(1, self.blocks):
                x = SEBasicBlock(self.planes, train=True, name=f"b{i}")(x)
            return x

    # the 3-stage audio encoder geometry (nn/resnet_se.py docstring).
    # stage1's input is the stem output of the SPECTROGRAM — the real
    # train step computes no gradient into it, so its isolated bench
    # differentiates params only; stages 2/3 receive activations that DO
    # carry gradient, so they keep the input-dgrad (ADVICE r4)
    stages = [
        ("stage1 3xblock(32)", _Stage(32, 3, 1, 32), (batch, 128, 124, 32),
         0),
        ("stage2 4xblock(64)", _Stage(64, 4, 2, 32), (batch, 128, 124, 32),
         (0, 1)),
        ("stage3 6xblock(128)", _Stage(128, 6, 2, 64), (batch, 64, 62, 64),
         (0, 1)),
    ]
    rows, sol_ms, tot_flops = [], 0.0, 0.0
    for name, mod, shape, argnums in stages:
        x = jnp.asarray(np.random.RandomState(0).randn(*shape),
                        jnp.bfloat16)
        variables = mod.init(jax.random.PRNGKey(0), x)
        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16), variables["params"])
        bstats = variables["batch_stats"]

        @jax.jit
        def fwd_bwd(params, bstats, x):
            def loss(p, x):
                out, upd = mod.apply(
                    {"params": p, "batch_stats": bstats}, x,
                    mutable=["batch_stats"])
                return jnp.sum(out.astype(jnp.float32))
            l, grads = jax.value_and_grad(loss, argnums=argnums)(
                params, x)
            if not isinstance(grads, tuple):
                grads = (grads,)
            # checksum over loss + every grad leaf (nothing cancellable)
            return l + sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                           for g in jax.tree_util.tree_leaves(grads))

        flops = _cost_flops(fwd_bwd.lower(params, bstats, x).compile())
        dt = timed_rounds(lambda i, p=params, b=bstats, x=x: fwd_bwd(p, b, x),
                          iters=10, rounds=3, warmup=2)
        c_out = mod.planes
        ceiling = BF16_PEAK_FLOPS * min(c_out, 128) / 128.0
        implied = flops / dt if flops else 0.0
        rows.append({
            "stage": name, "ms": round(dt * 1e3, 2),
            "gflops": round(flops / 1e9, 1) if flops else None,
            "tflops": round(implied / 1e12, 1),
            "pct_of_lane_ceiling": round(100 * implied / ceiling, 1),
            "lane_ceiling_tflops": round(ceiling / 1e12, 1),
        })
        sol_ms += flops / ceiling * 1e3
        tot_flops += flops
        print(f"[sol] {name}: {dt * 1e3:.1f} ms fwd+bwd, "
              f"{flops / 1e9:.0f} GFLOP, {implied / 1e12:.1f} TFLOP/s "
              f"= {100 * implied / ceiling:.0f}% of its "
              f"{ceiling / 1e12:.0f} TFLOP/s lane ceiling",
              file=sys.stderr)
    return {"batch": batch, "stages": rows,
            "se_fwd_bwd_sol_ms": round(sol_ms, 1),
            "se_fwd_bwd_flops_g": round(tot_flops / 1e9, 1)}


def _build_eval_pipeline(batch, precision="float32"):
    """(step, flops) for the eval device pipeline at one batch size."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from emotiongestures_tpu.core.precision import cast_tree

    from emotiongestures_tpu.models import (
        EmotionCVAEv3, FGDAutoEncoder, GestureTransformer,
        SkeletonTransformer)

    rng = np.random.RandomState(0)
    gen = GestureTransformer(n_words=N_WORDS, frames=FRAMES)
    vae = EmotionCVAEv3()
    fgd = FGDAutoEncoder()
    skl = SkeletonTransformer()
    spec = jnp.asarray(rng.randn(batch, 128, 124), jnp.float32)
    text = jnp.asarray(rng.randint(0, N_WORDS, (batch, FRAMES)))
    target = jnp.asarray(rng.randn(batch, FRAMES, 282), jnp.float32)
    y = jax.nn.one_hot(jnp.arange(batch) % 8, 8)
    gvars = gen.init(jax.random.PRNGKey(0), spec, text, target[:, :10])
    vvars = vae.init(
        {"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(2)},
        jnp.zeros((1, 60, 512), jnp.float32), jnp.zeros((1, 8), jnp.float32))
    fvars = fgd.init(jax.random.PRNGKey(3), target[:1])
    svars = skl.init(jax.random.PRNGKey(4), target[:1])

    use_bf16 = precision == "bfloat16"

    @jax.jit
    def eval_batch(gv, vv, fv, sv, spec, text, target, y, key):
        # params must be ARGUMENTS: closing over them embeds ~200 MB of
        # constants in the HLO, which the remote-compile tunnel rejects
        prior = target[:, :10]
        if use_bf16:
            gv = {**gv, "params": cast_tree(gv["params"], jnp.bfloat16)}
            vv = cast_tree(vv, jnp.bfloat16)
            spec_c, prior, y_c = (spec.astype(jnp.bfloat16),
                                  prior.astype(jnp.bfloat16),
                                  y.astype(jnp.bfloat16))
        else:
            spec_c, y_c = spec, y
        sampled = vae.apply(vv, y_c, method="sample", rngs={"sample": key})
        pred, *_ = gen.apply(gv, spec_c, text, prior, sampled,
                             train=False)
        pred = pred.astype(jnp.float32)
        _, feat_pred = fgd.apply(fv, pred)
        _, feat_tgt = fgd.apply(fv, target)
        logits, _ = skl.apply(sv, pred)
        acc = jnp.mean(jnp.argmax(logits, -1) == jnp.argmax(y, -1))
        l2 = jnp.mean(jnp.linalg.norm(target - pred, axis=-1))
        mpjre = jnp.mean(jnp.abs(target - pred)) * 57.2958
        return (jnp.sum(feat_pred) + jnp.sum(feat_tgt) + acc + l2 + mpjre)

    args = (gvars, vvars, fvars, svars, spec, text, target, y)
    flops = _cost_flops(
        eval_batch.lower(*args, jax.random.PRNGKey(0)).compile())

    def step(i):
        return eval_batch(*args, jax.random.PRNGKey(i))

    return step, flops


def bench_eval_pipeline(batch=1024, precision="float32") -> dict:
    """Device side of the eval CLI hot loop (test_...py:191-248): CVAE
    sample + generator + FGD features (pred & target) + skeleton-classifier
    logits + MPJRE/L2 reductions, one jitted step at batch 1024, with the
    flagship bench's honesty guards (VERDICT r2 item 5): cost-model FLOPs
    -> implied TFLOP/s, MFU asserted < chip peak, latency asserted to grow
    with batch. `precision="bfloat16"` = the eval CLI's --precision
    bfloat16 mode: generator+CVAE in bf16, metric nets fp32."""
    small = max(batch // 8, 1)
    small_step, _ = _build_eval_pipeline(small, precision)
    dt_small = timed_rounds(small_step, iters=10, rounds=3, warmup=2)
    step, flops = _build_eval_pipeline(batch, precision)
    dt = timed_rounds(step, iters=10, rounds=3, warmup=2)
    ratio = dt / dt_small
    assert ratio > 2.0, (
        f"eval latency flat across batch {small}->{batch} "
        f"(x{ratio:.2f}): measuring dispatch, not compute")
    implied = flops / dt if flops else None
    mfu = implied / BF16_PEAK_FLOPS if implied else None
    if mfu is not None:
        assert mfu < 1.0, (
            f"implied {implied / 1e12:.1f} TFLOP/s exceeds chip peak: "
            "measurement is broken")
    print(f"[bench] eval pipeline[{precision}]: {dt * 1e3:.1f} "
          f"ms/batch{batch} ({batch * FRAMES / dt / 1e3:.0f}k frames/s; "
          f"{dt_small * 1e3:.1f} ms/batch{small}, x{ratio:.1f})"
          + (f", {implied / 1e12:.1f} TFLOP/s, MFU {mfu * 100:.1f}%"
             if implied else ""),
          file=sys.stderr)
    return {"ms_per_batch": dt * 1e3, "batch": batch,
            "frames_per_sec": batch * FRAMES / dt,
            "batch_scaling_x8": round(ratio, 2),
            "implied_tflops": round(implied / 1e12, 2) if implied else None,
            "mfu_vs_bf16_peak": round(mfu, 4) if mfu else None,
            "precision": precision}


def _hostfeed_store(n_windows: int):
    """Build (or reuse) a realistic-size GestureStore for host feed-rate
    measurement (VERDICT r3 item 2): real BEAT window shapes — audio
    (64000,) f32, spectrogram (128, 128) f16 (the reference cache stores
    float16, utils/train_utils_BEAT.py:189), pose (60, 282) f32, ~8 timed
    words, eid aux — with random CONTENT (feed rate depends on bytes and
    layout, not values; synthesizing real mel content costs ~80 ms/sample
    x 50k which would dwarf the measurement)."""
    import numpy as np

    from emotiongestures_tpu.data.store import GestureStore, \
        GestureStoreWriter

    path = REPO / ".bench_cache" / f"hostfeed_store_{n_windows}"
    if path.exists():
        return GestureStore(path), path
    rng = np.random.RandomState(0)
    words = [f"word{i}" for i in range(256)]
    t0 = time.perf_counter()
    with GestureStoreWriter(path) as w:
        for i in range(n_windows):
            n_spoken = 4 + i % 8
            starts = np.sort(rng.uniform(0.0, 4.0, n_spoken))
            w.append({
                "word_seq": [[words[rng.randint(256)], float(s),
                              float(s + 0.3)] for s in starts],
                "pose_seq": rng.randn(60, 282).astype(np.float32),
                "audio": rng.randn(64000).astype(np.float32),
                "spectrogram": rng.randn(128, 128).astype(np.float16),
                "aux_info": {"eid": f"1_wayne_0_{i % 118 + 1}"
                                    f"_{i % 118 + 1}",
                             "start_time": 0.0, "end_time": 4.0,
                             "start_frame_no": 0, "end_frame_no": 60},
            })
    print(f"# built {n_windows}-window store in "
          f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)
    return GestureStore(path), path


def bench_host_feed(n_windows: int = 50000, batch: int = 128,
                    measure_s: float = 20.0) -> dict:
    """Sustained host samples/s through the real training input path
    (VERDICT r3 item 2): GestureStore decode + __getitem__ fixups +
    extend_word_seq + collate, via dataset.batches() — the exact producer
    feeding the GAN train loop. Also reports the native-codec
    store_batches fast path and the pure-python batch_field fallback for
    the classifier-style (spectrogram, label) feed."""
    import numpy as np

    from emotiongestures_tpu.data.dataset import (SpeechMotionDataset,
                                                  one_hot_eid)
    from emotiongestures_tpu.data.pipeline import store_batches
    from emotiongestures_tpu.data.vocab import Vocab

    store, path = _hostfeed_store(n_windows)
    ds = SpeechMotionDataset(path, use_cache_suffix=False)
    lang = Vocab("words")
    for i in range(256):
        lang.index_word(f"word{i}")
    ds.set_lang_model(lang)

    def rate(batch_iter):
        """samples/s over ≥measure_s of sustained iteration (fresh
        iterator epochs as needed; never counts a partial batch)."""
        n = 0
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < measure_s:
            for b in batch_iter():
                n += len(b["pose_seq"])
                if time.perf_counter() - t0 >= measure_s:
                    break
        return n / (time.perf_counter() - t0)

    # the full GAN-trainer path (decode + fixups + text grid + collate)
    full = rate(lambda: ds.batches(batch, shuffle=True, seed=1))
    # same, per-record python path (native batch assembly disabled)
    full_slow = rate(lambda: ds.batches(batch, shuffle=True, seed=1,
                                        native=False))
    # what the GAN trainer actually requests (fields=: no raw audio)
    gan_keys = ("spectrogram", "text", "pose_seq", "eid_label")
    trainer = rate(lambda: ds.batches(batch, shuffle=True, seed=1,
                                      fields=gan_keys))
    # the FGD auxiliary trainer's feed (pose_seq only)
    fgd = rate(lambda: ds.batches(batch, shuffle=True, seed=1,
                                  fields=("pose_seq",)))
    # native C++ batch decode (classifier-style fixed-shape fields)
    native = rate(lambda: store_batches(
        store, ("spectrogram", "pose_seq"), batch, shuffle=True, seed=1,
        labels_fn=lambda r: one_hot_eid(r["aux_info"]["eid"])))
    # pure-python per-record decode of the same fields (codec fallback)
    def py_batches():
        order = np.random.RandomState(1).permutation(len(store))
        for i in range(0, len(store) - batch + 1, batch):
            idx = order[i:i + batch]
            yield {"spectrogram": np.stack(
                       [np.asarray(store[int(j)]["spectrogram"],
                                   np.float32) for j in idx]),
                   "pose_seq": np.stack(
                       [np.asarray(store[int(j)]["pose_seq"], np.float32)
                        for j in idx])}
    python = rate(py_batches)

    train_demand = 1586.0  # bf16 GAN samples/s/chip (BASELINE.md)
    return {
        "n_windows": n_windows, "batch": batch,
        "store_gb": round((path / "data.bin").stat().st_size / 2**30, 2),
        "native_codec": store.native_available,
        "full_getitem_samples_per_s": round(full, 1),
        "full_getitem_slowpath_samples_per_s": round(full_slow, 1),
        "gan_trainer_fields_samples_per_s": round(trainer, 1),
        "fgd_trainer_fields_samples_per_s": round(fgd, 1),
        "native_batch_decode_samples_per_s": round(native, 1),
        "python_batch_decode_samples_per_s": round(python, 1),
        "train_demand_per_chip": train_demand,
        "chips_fed_full_path": round(full / train_demand, 2),
        "chips_fed_gan_trainer_path": round(trainer / train_demand, 2),
        "chips_fed_native_path": round(native / train_demand, 2),
    }


def main():
    if "--hostfeed" in sys.argv:
        n = 50000
        for a in sys.argv:
            if a.startswith("--windows="):
                n = int(a.split("=")[1])
        print(json.dumps({"mode": "host_feed", **bench_host_feed(n)}))
        return
    if "--stage3" in sys.argv:
        print(json.dumps({"mode": "stage3_head_race", **bench_stage3()}))
        return
    if "--sol-train" in sys.argv:
        print(json.dumps({"mode": "sol_train", **bench_sol_train()}))
        return
    if "--mel" in sys.argv:
        print(json.dumps({"mode": "mel_frontend",
                          **bench_mel_frontend()}))
        return
    if "--train" in sys.argv:
        cdtype = "bfloat16" if "--bf16" in sys.argv else "float32"
        order = "g_first" if "--g-first" in sys.argv else "d_first"
        batch = 128
        for a in sys.argv:
            if a.startswith("--batch="):
                batch = int(a.split("=")[1])
        print(json.dumps({"mode": "train_step",
                          **bench_train_step(
                              batch=batch, compute_dtype=cdtype,
                              update_order=order,
                              remat_audio="--remat" in sys.argv,
                              d_concat_batch="--d-concat" in sys.argv,
                              grad_dtype=("bfloat16" if "--grad-bf16"
                                          in sys.argv else "float32")),
                          "remat_audio": "--remat" in sys.argv,
                          "d_concat_batch": "--d-concat" in sys.argv,
                          "grad_dtype": ("bfloat16" if "--grad-bf16"
                                         in sys.argv else "float32")}))
        return
    if "--eval" in sys.argv:
        prec = "bfloat16" if "--bf16" in sys.argv else "float32"
        print(json.dumps({"mode": "eval_pipeline",
                          **bench_eval_pipeline(precision=prec)}))
        return
    precision = "fp32" if "--fp32" in sys.argv else "bf16"
    fused = "--no-fused" not in sys.argv
    r = bench_jax(precision, fused)
    baseline = get_baseline()
    value = r["frames_per_sec"]
    result = {
        "metric": "generated_gesture_frames_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "frames/s",
        "vs_baseline": round(value / baseline, 2) if baseline else None,
        "batch": r["batch"],
        "ms_per_batch": round(r["ms_per_batch"], 2),
        "implied_tflops": r["implied_tflops"],
        "mfu_vs_bf16_peak": r["mfu_vs_bf16_peak"],
        "precision": r["precision"],
        "fused_attention": r["fused_attention"],
        "baseline_batch": 16,
        "baseline_note": "torch-CPU reference at batch 16 (python-loop "
                         "memory module makes large CPU batches infeasible)",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

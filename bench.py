"""Benchmark: diverse gesture generation throughput on one chip.

Measures the eval entry point's device hot path (test_...py:191-248):
CVAE prior sampling + full generator forward, as ONE jitted function, and
reports generated gesture frames/sec/chip.

Baseline (BASELINE.md): the PyTorch reference generator running the same
batch on CPU, imported straight from /root/reference (stubbed optional
deps), measured once and cached in BASELINE_measured.json.

Prints exactly one JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": R}
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
BATCH = 1024  # serving batch; throughput is dispatch-bound below ~512
FRAMES = 60
N_WORDS = 64
WARMUP = 3
ITERS = 40
BASELINE_CACHE = REPO / "BASELINE_measured.json"
REFERENCE = Path(os.environ.get("EGTP_REFERENCE", "/root/reference"))


def bench_jax() -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from emotiongestures_tpu.models import EmotionCVAEv3, GestureTransformer

    rng = np.random.RandomState(0)
    gen = GestureTransformer(n_words=N_WORDS, frames=FRAMES)
    vae = EmotionCVAEv3()
    spec = jnp.asarray(rng.randn(BATCH, 128, 124), jnp.float32)
    text = jnp.asarray(rng.randint(0, N_WORDS, (BATCH, FRAMES)))
    prior = jnp.asarray(rng.randn(BATCH, 10, 282), jnp.float32)
    y = jax.nn.one_hot(jnp.arange(BATCH) % 8, 8)
    gvars = gen.init(jax.random.PRNGKey(0), spec, text, prior)
    vvars = vae.init(
        {"params": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(2)},
        jnp.zeros((1, 60, 512), jnp.float32), jnp.zeros((1, 8), jnp.float32))

    @jax.jit
    def diverse_forward(gv, vv, spec, text, prior, y, key):
        sampled = vae.apply(vv, y, method="sample", rngs={"sample": key})
        return gen.apply(gv, spec, text, prior, sampled, train=False)[0]

    out = diverse_forward(gvars, vvars, spec, text, prior, y,
                          jax.random.PRNGKey(0))
    out.block_until_ready()
    warm = [diverse_forward(gvars, vvars, spec, text, prior, y,
                            jax.random.fold_in(jax.random.PRNGKey(1), i))
            for i in range(WARMUP)]
    jax.block_until_ready(warm)
    # keep every output alive until the final barrier: a GC'd result
    # buffer lets the runtime cancel its computation, inflating numbers.
    # median of 3 rounds tames the tunnel's dispatch-latency noise.
    times = []
    for r in range(3):
        t0 = time.perf_counter()
        outs = [diverse_forward(gvars, vvars, spec, text, prior, y,
                                jax.random.fold_in(
                                    jax.random.PRNGKey(2 + r), i))
                for i in range(ITERS)]
        jax.block_until_ready(outs)
        times.append((time.perf_counter() - t0) / ITERS)
        del outs
    dt = sorted(times)[1]
    print(f"[bench] jax: {dt * 1e3:.2f} ms/batch{BATCH} on "
          f"{jax.devices()[0]}", file=sys.stderr)
    return BATCH * FRAMES / dt


def bench_torch_reference() -> float | None:
    """Measure the actual PyTorch reference generator on CPU (the
    reference's only non-CUDA fallback). Returns frames/sec or None."""
    try:
        import types

        import numpy as np
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


def main():
    value = bench_jax()
    baseline = get_baseline()
    result = {
        "metric": "generated_gesture_frames_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "frames/s",
        "vs_baseline": round(value / baseline, 2) if baseline else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

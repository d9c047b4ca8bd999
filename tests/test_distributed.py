"""Multi-host scaffolding test (VERDICT r2 item 2 / SURVEY §2.6
"multi-host via jax.distributed over DCN"): spawn 2 REAL processes on the
CPU backend (2 local devices each -> 4 global), initialize the cluster,
assemble a global data-sharded batch from per-process slices, run one
data-parallel FGD train step, and check the loss matches single-process
execution of the same global batch."""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
from emotiongestures_tpu.parallel import distributed as dist

idx, cnt = dist.initialize(f"localhost:{port}", nproc, pid)
assert (idx, cnt) == (pid, nproc), (idx, cnt)
assert jax.device_count() == 2 * nproc, jax.devices()
assert len(jax.local_devices()) == 2

mesh = dist.global_mesh()
assert mesh.devices.size == 2 * nproc

# the full global batch is deterministic; each process LOADS only its slice
N = 16
poses = np.random.RandomState(7).randn(N, 60, 282).astype(np.float32)
sl = dist.process_batch_slice(N)
assert sl == slice(pid * N // nproc, (pid + 1) * N // nproc)
gbatch = dist.host_local_batch(poses[sl], mesh)
assert gbatch.shape == (N, 60, 282)  # global shape, host held N//nproc rows

from emotiongestures_tpu.train import fgd

state = fgd.create_state(jax.random.PRNGKey(0))
state = dist.replicate_to_global(state, mesh)
losses = []
for step in range(2):
    state, m = fgd.train_step(state, gbatch, jax.random.PRNGKey(1 + step))
    losses.append(float(m["loss"]))

if dist.is_primary():
    print("RESULT " + json.dumps({"losses": losses}))
dist.shutdown()
"""


@pytest.mark.slow
def test_two_process_dp_fgd_matches_single_process(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = str(ROOT) + os.pathsep + env.get("PYTHONPATH", "")
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", str(port)],
            cwd=ROOT, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for pid in range(2)
    ]
    # generous: under pytest-xdist all 8 workers timeshare ONE core
    outs = [p.communicate(timeout=2400) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
    result_lines = [ln for out, _ in outs for ln in out.splitlines()
                    if ln.startswith("RESULT ")]
    assert len(result_lines) == 1  # only the primary prints
    losses = json.loads(result_lines[0][len("RESULT "):])["losses"]

    # single-process reference on the same global batch
    import jax

    from emotiongestures_tpu.train import fgd

    poses = np.random.RandomState(7).randn(16, 60, 282).astype(np.float32)
    state = fgd.create_state(jax.random.PRNGKey(0))
    ref = []
    for step in range(2):
        state, m = fgd.train_step(state, poses,
                                  jax.random.PRNGKey(1 + step))
        ref.append(float(m["loss"]))
    np.testing.assert_allclose(losses, ref, rtol=1e-4)


WORKER_CLI = r"""
import json, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                            sys.argv[3], sys.argv[4])
from emotiongestures_tpu.cli import train_emotion_gesture as cli

args = cli.build_parser().parse_args([
    "--synthetic", "16", "--batch_size", "8", "--total_epoch", "1",
    "--d_model", "64", "--latent_dim", "128", "--gen_layers", "1",
    "--save_every", "100", "--model_save_path", outdir,
    "--coordinator_address", f"localhost:{port}",
    "--num_processes", str(nproc), "--process_id", str(pid),
])
gen_state, disc_state = cli.main(args)
checksum = float(sum(np.abs(np.asarray(l)).sum()
                     for l in jax.tree_util.tree_leaves(gen_state.params)))
print("RESULT " + json.dumps({"pid": pid, "step": int(gen_state.step),
                              "checksum": checksum}))
"""


@pytest.mark.slow
def test_multihost_train_cli_matches_single_process(tmp_path):
    """The production GAN train CLI runs multi-host (2 processes x 2 CPU
    devices) via --coordinator_address/--num_processes/--process_id and
    lands on the same parameters as the plain single-process run."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = str(ROOT) + os.pathsep + env.get("PYTHONPATH", "")
    script = tmp_path / "worker_cli.py"
    script.write_text(WORKER_CLI)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", str(port),
             str(tmp_path / f"run{pid}")],
            cwd=ROOT, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for pid in range(2)
    ]
    # generous: under pytest-xdist all 8 workers timeshare ONE core
    outs = [p.communicate(timeout=2400) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
    results = [json.loads(ln[len("RESULT "):])
               for out, _ in outs for ln in out.splitlines()
               if ln.startswith("RESULT ")]
    assert len(results) == 2  # every process returns the trained state
    assert results[0]["step"] == results[1]["step"] == 2
    # replicated params must agree across processes bit-for-bit
    assert results[0]["checksum"] == pytest.approx(
        results[1]["checksum"], rel=1e-7)

    # single-process reference: same flags, no distributed args
    from emotiongestures_tpu.cli import train_emotion_gesture as cli

    args = cli.build_parser().parse_args([
        "--synthetic", "16", "--batch_size", "8", "--total_epoch", "1",
        "--d_model", "64", "--latent_dim", "128", "--gen_layers", "1",
        "--save_every", "100", "--num_devices", "1",
        "--model_save_path", str(tmp_path / "single")])
    gen_state, _ = cli.main(args)
    import jax

    ref = float(sum(np.abs(np.asarray(l)).sum()
                    for l in jax.tree_util.tree_leaves(gen_state.params)))
    # integral |param| sums: reassociation noise is tiny relative to the
    # ~1e5-scale checksum; semantic deviation would move it by >1e-3 rel
    assert results[0]["checksum"] == pytest.approx(ref, rel=1e-4)


WORKER_AUX = r"""
import json, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

pid, nproc, port, outdir, model = (int(sys.argv[1]), int(sys.argv[2]),
                                   sys.argv[3], sys.argv[4], sys.argv[5])
from emotiongestures_tpu.cli import train_auxiliary as cli

args = cli.build_parser().parse_args([
    "--model", model, "--synthetic", "16", "--batch_size", "8",
    "--total_epoch", "1", "--save_every", "100",
    "--d_model", "64", "--latent_dim", "128", "--gen_layers", "1",
    "--model_save_path", outdir,
    "--coordinator_address", f"localhost:{port}",
    "--num_processes", str(nproc), "--process_id", str(pid),
])
state = cli.main(args)
checksum = float(sum(np.abs(np.asarray(l)).sum()
                     for l in jax.tree_util.tree_leaves(state.params)))
print("RESULT " + json.dumps({"pid": pid, "step": int(state.step),
                              "checksum": checksum}))
"""


@pytest.mark.slow
@pytest.mark.parametrize("model", ["fgd", "cvae"])
def test_multihost_aux_trainer_matches_single_process(tmp_path, model):
    """The auxiliary trainers run multi-host with the same flags as the
    GAN CLI (fgd = simple path; cvae = the frozen-generator feature
    extractor executes the first cross-process collectives during the
    two-phase compile-alignment)."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = str(ROOT) + os.pathsep + env.get("PYTHONPATH", "")
    script = tmp_path / "worker_aux.py"
    script.write_text(WORKER_AUX)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", str(port),
             str(tmp_path / f"run{pid}"), model],
            cwd=ROOT, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for pid in range(2)
    ]
    # generous: under pytest-xdist all 8 workers timeshare ONE core
    outs = [p.communicate(timeout=2400) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
    results = [json.loads(ln[len("RESULT "):])
               for out, _ in outs for ln in out.splitlines()
               if ln.startswith("RESULT ")]
    assert len(results) == 2
    assert results[0]["step"] == results[1]["step"] == 2
    assert results[0]["checksum"] == pytest.approx(
        results[1]["checksum"], rel=1e-7)

    # single-process reference: same flags, no distributed args
    from emotiongestures_tpu.cli import train_auxiliary as cli

    args = cli.build_parser().parse_args([
        "--model", model, "--synthetic", "16", "--batch_size", "8",
        "--total_epoch", "1", "--save_every", "100",
        "--d_model", "64", "--latent_dim", "128", "--gen_layers", "1",
        "--num_devices", "1", "--model_save_path", str(tmp_path / "single")])
    state = cli.main(args)
    import jax

    ref = float(sum(np.abs(np.asarray(l)).sum()
                    for l in jax.tree_util.tree_leaves(state.params)))
    assert results[0]["checksum"] == pytest.approx(ref, rel=1e-4)

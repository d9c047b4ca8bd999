"""main() wiring of the training CLIs (the eval CLI's main is covered by
tests/test_integration.py): argument plumbing, checkpoint save layout,
and --resume continuation. Tiny dims keep CPU compile bounded."""
import jax
import numpy as np
import pytest


def _train_args(parser, tmp_path, extra=()):
    return parser.parse_args([
        "--synthetic", "16", "--batch_size", "8", "--total_epoch", "1",
        "--d_model", "64", "--latent_dim", "128", "--gen_layers", "1",
        "--save_every", "100",
        "--model_save_path", str(tmp_path / "run"), *extra,
    ])


@pytest.mark.slow
def test_train_emotion_gesture_main_and_resume(tmp_path):
    from emotiongestures_tpu.cli import train_emotion_gesture as cli

    gen1, disc1 = cli.main(_train_args(cli.build_parser(), tmp_path))
    assert int(gen1.step) == 2  # 16 samples / batch 8 = 2 iters
    for leaf in jax.tree_util.tree_leaves(gen1.params):
        assert np.isfinite(np.asarray(leaf)).all()
    # --resume restores the saved states and continues the step counter
    gen2, disc2 = cli.main(
        _train_args(cli.build_parser(), tmp_path, extra=("--resume",)))
    assert int(gen2.step) == 4
    assert int(disc2.step) == 4


@pytest.mark.slow
@pytest.mark.parametrize("model", ["fgd", "skeleton", "cvae"])
def test_train_auxiliary_main(tmp_path, model):
    from emotiongestures_tpu.cli import train_auxiliary as cli

    args = cli.build_parser().parse_args([
        "--model", model, "--synthetic", "16", "--batch_size", "8",
        "--total_epoch", "1", "--save_every", "100",
        "--model_save_path", str(tmp_path / model),
    ])
    state = cli.main(args)
    assert state is not None
    assert int(state.step) >= 1
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()
    if model == "fgd":
        # --resume (the egtp-convert-checkpoint fine-tune entry) restores
        # the saved state and continues the step counter
        resumed = cli.main(cli.build_parser().parse_args([
            "--model", model, "--synthetic", "16", "--batch_size", "8",
            "--total_epoch", "1", "--save_every", "100",
            "--model_save_path", str(tmp_path / model), "--resume",
        ]))
        assert int(resumed.step) == int(state.step) * 2


@pytest.mark.slow
def test_train_auxiliary_skeleton_plateau_reseed(tmp_path):
    """Forced plateau (unreachable acc target): the skeleton trainer
    reseeds, drops the stale attempt's checkpoints, and finishes with a
    trainable state (VERDICT r3 Weak #4 wiring)."""
    from emotiongestures_tpu.cli import train_auxiliary as cli

    args = cli.build_parser().parse_args([
        "--model", "skeleton", "--synthetic", "16", "--batch_size", "8",
        "--total_epoch", "2", "--save_every", "1",
        "--model_save_path", str(tmp_path / "aux"),
        "--plateau_patience", "1", "--plateau_acc", "101.0",
        "--max_reseeds", "1",
    ])
    state = cli.main(args)
    # set_logger reconfigures root handlers (so caplog can't see the
    # records) — assert on the trainer's own log file instead
    log_text = (tmp_path / "aux" / "train_skeleton.log").read_text()
    assert "plateau" in log_text
    assert int(state.step) >= 1
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()
    # the post-reseed checkpoints restart from step 1 — stale
    # higher-step dirs from the dropped attempt must be gone
    from emotiongestures_tpu.utils import latest_step

    assert latest_step(tmp_path / "aux" / "skeleton") == int(state.step)


def test_console_script_wrappers_return_none():
    """ADVICE r2: the [project.scripts] entry points must not return
    main()'s rich value (sys.exit(dict/list/count) exits nonzero). Every
    registered entry point targets a cli() wrapper returning None."""
    import importlib
    import tomllib
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    cfg = tomllib.loads((root / "pyproject.toml").read_text())
    scripts = cfg["project"]["scripts"]
    assert scripts, "no console scripts registered"
    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        assert func_name == "cli", (name, target)
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, func_name)
        assert callable(fn)
        # returning None is the contract; check annotation if present
        assert fn.__annotations__.get("return", None) in (None, "None")


@pytest.mark.slow
def test_train_emotion_gesture_dp_mesh_matches_single_device(tmp_path):
    """VERDICT r2 item 1: the production train CLI runs data-parallel on
    the 8-device CPU mesh (--num_devices 8) and matches the single-device
    run (--num_devices 1) — same seeds, same batches, GSPMD semantics.
    Tolerance mirrors tests/test_parallel.py: float reassociation can
    flip Adam's ±lr sign on near-zero grads, so a handful of outliers up
    to the per-step LR quantum is benign; semantic deviation would move
    many elements and the losses by percents."""
    from emotiongestures_tpu.cli import train_emotion_gesture as cli

    def run(n_dev, sub):
        args = _train_args(cli.build_parser(), tmp_path / sub, extra=(
            "--num_devices", str(n_dev), "--total_epoch", "2"))
        return cli.main(args)

    gen1, _ = run(1, "single")
    gen8, _ = run(8, "mesh")
    assert int(gen1.step) == int(gen8.step) == 4
    lr_quantum = 4 * 2 * 2e-4  # steps * 2*lr
    n_out = n_tot = 0
    for x, y in zip(jax.tree_util.tree_leaves(gen1.params),
                    jax.tree_util.tree_leaves(gen8.params)):
        diff = np.abs(np.asarray(x) - np.asarray(y))
        assert diff.max() < 5e-3, diff.max()
        n_out += int(np.sum(diff > lr_quantum))
        n_tot += diff.size
    assert n_out <= max(1, n_tot // 1000), (n_out, n_tot)


# NOTE: no CLI-level DP test for the classifier — the 4-stage EmotionNet
# grad compile at full spectrogram shape is pathologically slow on the
# CPU backend under GSPMD (measured: 110 s single-device, 280 s on a
# 2-device mesh, >25 min on 8). The CLI's mesh wiring is one line into
# classifier.train_k_fold(mesh=...); DP parity of the underlying jitted
# train_step is pinned at a small spectrogram by
# tests/test_parallel.py::test_dp_classifier_train_matches_single_device,
# and the identical CLI wiring is covered end-to-end for the GAN trainer
# below.


def test_convert_checkpoint_cli(tmp_path):
    """egtp-convert-checkpoint: reference .pth -> orbax TrainState that
    the eval CLI's orbax path then restores bit-exactly."""
    import jax
    import jax.numpy as jnp
    import torch

    from emotiongestures_tpu.cli import convert_checkpoint as cli
    from emotiongestures_tpu.core import schedules
    from emotiongestures_tpu.models import FGDAutoEncoder
    from emotiongestures_tpu.train.state import create_train_state
    from emotiongestures_tpu.utils import load_checkpoint
    from emotiongestures_tpu.utils import torch_port as tp

    fgd = FGDAutoEncoder(pose_dim=282)
    src = fgd.init(jax.random.PRNGKey(5), jnp.zeros((1, 60, 282)))
    pth = tmp_path / "checkpoint_iteration8100.pth"
    torch.save({f"module.{k}": torch.tensor(v) for k, v in
                tp.flax_fgd_ae_to_torch_state(src).items()}, pth)

    out = cli.main(cli.build_parser().parse_args([
        "--kind", "fgd", "--input", str(pth),
        "--output", str(tmp_path / "orbax")]))

    fresh = create_train_state(
        fgd, fgd.init(jax.random.PRNGKey(9), jnp.zeros((1, 60, 282))),
        schedules.adam(lr=1e-4))
    restored, ok = load_checkpoint(fresh, out)
    assert ok
    got = jax.tree_util.tree_leaves(restored.params)
    want = jax.tree_util.tree_leaves(src["params"])
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize("kind", ["generator", "skeleton", "emotion_net",
                                  "cvae_v1"])
def test_convert_checkpoint_cli_kinds(tmp_path, kind):
    """Round-trip every remaining converter kind: build the flax model the
    CLI's _build wiring constructs, export its init to a reference-style
    state_dict, convert, and check the orbax restore is bit-exact."""
    import jax
    import jax.numpy as jnp
    import torch

    from emotiongestures_tpu.cli import convert_checkpoint as cli
    from emotiongestures_tpu.core import schedules
    from emotiongestures_tpu.train.state import create_train_state
    from emotiongestures_tpu.utils import load_checkpoint
    from emotiongestures_tpu.utils import torch_port as tp

    flags = ["--kind", kind, "--input", str(tmp_path / "ref.pth"),
             "--output", str(tmp_path / "orbax")]
    if kind in ("generator", "skeleton"):
        flags += ["--d_model", "64", "--latent_dim", "128"]
    if kind == "generator":
        flags += ["--gen_layers", "1"]
    args = cli.build_parser().parse_args(flags)

    model, init_args, needs_sample, _ = cli._build(args)
    rngs = {"params": jax.random.PRNGKey(7)}
    if needs_sample:
        rngs["sample"] = jax.random.PRNGKey(8)
    src = model.init(rngs, *init_args)
    export = {
        "generator": lambda v: tp.flax_generator_to_torch_state(
            v, n_layers=1),
        "skeleton": lambda v: tp.flax_skeleton_classifier_to_torch_state(
            v, n_layers=3),
        "emotion_net": tp.flax_emotion_net_to_torch_state,
        "cvae_v1": lambda v: tp.flax_table_to_torch_state(
            v, tp.cvae_v1_mapping()),
    }[kind]
    torch.save({k: torch.tensor(v) for k, v in export(src).items()},
               tmp_path / "ref.pth")

    out = cli.main(args)

    fresh = create_train_state(model, model.init(
        {k: jax.random.fold_in(r, 1) for k, r in rngs.items()},
        *init_args), schedules.adam(lr=1e-4))
    restored, ok = load_checkpoint(fresh, out)
    assert ok
    for g, w in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(src["params"])):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_convert_checkpoint_cli_cvae_rich_dict(tmp_path):
    """The cvae kind exercises the sample-rng init branch and the
    rich-dict 'gen_dict' unwrap (utils/train_utils.py:168-213 layout)."""
    import jax
    import jax.numpy as jnp
    import torch

    from emotiongestures_tpu.cli import convert_checkpoint as cli
    from emotiongestures_tpu.core import schedules
    from emotiongestures_tpu.models import EmotionCVAEv3
    from emotiongestures_tpu.train.state import create_train_state
    from emotiongestures_tpu.utils import load_checkpoint
    from emotiongestures_tpu.utils import torch_port as tp

    vae = EmotionCVAEv3(feat_dim=512)
    feats = jnp.zeros((1, 60, 512), jnp.float32)
    y = jnp.zeros((1, 8), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(3),
            "sample": jax.random.PRNGKey(4)}
    src = vae.init(rngs, feats, y)
    pth = tmp_path / "checkpoint_iteration35200.pth"
    torch.save(
        {"gen_dict": {k: torch.tensor(v) for k, v in
                      tp.flax_cvae_v3_to_torch_state(src).items()}}, pth)

    out = cli.main(cli.build_parser().parse_args([
        "--kind", "cvae", "--input", str(pth),
        "--output", str(tmp_path / "orbax")]))

    fresh = create_train_state(
        vae, vae.init({"params": jax.random.PRNGKey(9),
                       "sample": jax.random.PRNGKey(10)}, feats, y),
        schedules.adam(lr=1e-4))
    restored, ok = load_checkpoint(fresh, out)
    assert ok
    got = jax.tree_util.tree_leaves(restored.params)
    want = jax.tree_util.tree_leaves(src["params"])
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.slow
def test_train_emotion_gesture_profile_dir(tmp_path):
    """--profile_dir captures a jax.profiler trace of the steady-state
    window (starts after step 3, so 2 epochs x 2 iters reaches it).

    Runs in a SUBPROCESS: an active profiler trace forces pjit onto the
    python dispatch path, whose first call per signature RECOMPILES, and
    XLA:CPU work under an active trace segfaults at deep process state —
    five full-suite crashes landed in this test (in deserialize,
    serialize, and finally the compile itself) while it passes in any
    shallow process. The package's cache guards (see __init__.py)
    removed the cache-side crash sites; the in-trace compile crash is an
    XLA bug we can only sidestep by keeping the traced run shallow."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    trace_dir = tmp_path / "trace"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    root = Path(__file__).resolve().parent.parent
    env["PYTHONPATH"] = str(root) + os.pathsep + env.get("PYTHONPATH", "")
    script = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from emotiongestures_tpu.cli import train_emotion_gesture as cli\n"
        "args = cli.build_parser().parse_args([\n"
        "    '--synthetic', '16', '--batch_size', '8', '--total_epoch',"
        " '2',\n"
        "    '--d_model', '64', '--latent_dim', '128', '--gen_layers',"
        " '1',\n"
        f"    '--save_every', '100', '--model_save_path',"
        f" {str(tmp_path / 'run')!r},\n"
        f"    '--profile_dir', {str(trace_dir)!r}, '--profile_steps',"
        " '1'])\n"
        "gen, _ = cli.main(args)\n"
        "print('STEP', int(gen.step))\n"
    )
    proc = subprocess.run([sys.executable, "-c", script], cwd=root,
                          env=env, capture_output=True, text=True,
                          timeout=2400)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "STEP 4" in proc.stdout
    traces = list(trace_dir.rglob("*.xplane.pb"))
    assert traces, f"no profiler trace written under {trace_dir}"


@pytest.mark.slow
def test_train_emotion_gesture_sigterm_checkpoints_and_resumes(tmp_path):
    """Preemption safety (SURVEY §5, VERDICT r3 item 4): SIGTERM mid-epoch
    -> the trainer checkpoints at a step boundary and exits cleanly
    (returncode 0); a --resume run continues from that step."""
    import os
    import signal
    import subprocess
    import sys
    import time
    from pathlib import Path

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    root = Path(__file__).resolve().parent.parent
    env["PYTHONPATH"] = str(root) + os.pathsep + env.get("PYTHONPATH", "")
    run_dir = tmp_path / "run"
    base_flags = (
        f"    '--synthetic', '16', '--batch_size', '8',\n"
        f"    '--d_model', '64', '--latent_dim', '128', '--gen_layers',"
        f" '1',\n"
        f"    '--save_every', '1000', '--model_save_path',"
        f" {str(run_dir)!r},\n"
    )
    script = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from emotiongestures_tpu.cli import train_emotion_gesture as cli\n"
        "args = cli.build_parser().parse_args([\n"
        "    '--total_epoch', '10000',\n" + base_flags + "])\n"
        "gen, _ = cli.main(args)\n"
        "print('STEP', int(gen.step), flush=True)\n"
    )
    proc = subprocess.Popen([sys.executable, "-c", script], cwd=root,
                            env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True)
    try:
        # wait until training demonstrably progresses (first metrics line
        # lands at iter 10), then preempt
        metrics = run_dir / "metrics.jsonl"
        deadline = time.time() + 1200
        while time.time() < deadline:
            if metrics.exists() and metrics.stat().st_size > 0:
                break
            if proc.poll() is not None:
                raise AssertionError(proc.stderr.read()[-3000:])
            time.sleep(0.5)
        else:
            raise AssertionError("trainer never reached iter 10")
        proc.send_signal(signal.SIGTERM)
        out, err = proc.communicate(timeout=600)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()
    assert proc.returncode == 0, err[-3000:]
    assert "STEP" in out
    killed_step = int(out.split("STEP", 1)[1].split()[0])
    assert killed_step >= 10
    from emotiongestures_tpu.utils import latest_step

    assert latest_step(run_dir / "generator") == killed_step
    assert latest_step(run_dir / "discriminator") == killed_step

    # resume continues the step counter from the preempted checkpoint
    resume = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from emotiongestures_tpu.cli import train_emotion_gesture as cli\n"
        "args = cli.build_parser().parse_args([\n"
        "    '--total_epoch', '1', '--resume',\n" + base_flags + "])\n"
        "gen, _ = cli.main(args)\n"
        "print('STEP', int(gen.step), flush=True)\n"
    )
    done = subprocess.run([sys.executable, "-c", resume], cwd=root, env=env,
                          capture_output=True, text=True, timeout=2400)
    assert done.returncode == 0, done.stderr[-3000:]
    resumed_step = int(done.stdout.split("STEP", 1)[1].split()[0])
    assert resumed_step == killed_step + 2  # 16 samples / batch 8


@pytest.mark.slow
def test_train_emotion_gesture_model_parallel_cli(tmp_path):
    """--model_parallel 2 on the 8-device CPU mesh (4x2 data-model):
    the CLI wires parallel.tp_setup/shard_state_tp; one run, losses
    finite, step counter advances. Numerical parity of the TP step is
    pinned by tests/test_parallel.py::test_tp_gan_train_step_matches_
    single_device."""
    from emotiongestures_tpu.cli import train_emotion_gesture as cli

    args = _train_args(cli.build_parser(), tmp_path, extra=(
        "--num_devices", "8", "--model_parallel", "2"))
    gen, disc = cli.main(args)
    assert int(gen.step) == 2
    for leaf in jax.tree_util.tree_leaves(gen.params):
        assert np.isfinite(np.asarray(leaf)).all()
    # the FFN kernels must actually be model-sharded on the 2-D mesh
    specs = [str(leaf.sharding.spec)
             for leaf in jax.tree_util.tree_leaves(gen.params)
             if hasattr(leaf, "sharding") and hasattr(leaf.sharding, "spec")]
    assert any("model" in s for s in specs), specs[:5]


def test_kfold_resume_continues_fold(tmp_path):
    """VERDICT r4 item 3 plumbing: kill a K-fold run mid-fold (via
    should_stop), --resume restores the fold and continues it to the
    test pass; earlier folds are not re-run."""
    import jax

    from emotiongestures_tpu.data.synthetic import SyntheticGestureDataset
    from emotiongestures_tpu.train import classifier
    from emotiongestures_tpu.utils import load_checkpoint, save_checkpoint

    full = SyntheticGestureDataset(n_samples=40, seed=0)
    test = SyntheticGestureDataset(n_samples=8, seed=1)
    saved = {}

    def checkpoint_fn(state, fold, epoch, it):
        save_checkpoint(state, tmp_path)
        saved.update(fold=fold, iter=it)

    # run that dies after 3 steps of fold 0 (epoch 2 of 0..)
    calls = {"n": 0}

    def stopper():
        calls["n"] += 1
        return calls["n"] > 8

    classifier.train_k_fold(
        full, test, batch_size=8, n_splits=4, epochs=4, eval_every=2,
        seed=0, max_folds=2, checkpoint_fn=checkpoint_fn,
        should_stop=stopper)
    assert saved and saved["fold"] == 0
    template = classifier.create_state(jax.random.PRNGKey(0))
    state, ok = load_checkpoint(template, tmp_path)
    assert ok and int(state.step) >= 2

    results = classifier.train_k_fold(
        full, test, batch_size=8, n_splits=4, epochs=4, eval_every=2,
        seed=0, max_folds=2, checkpoint_fn=checkpoint_fn,
        resume_from=(state, saved["fold"]))
    # the resumed run finishes fold 0 AND fold 1
    assert [r["fold"] for r in results] == [0, 1]
    # fold 0's state continued from the checkpoint to the same total an
    # uninterrupted run reaches: 4 epochs x (30 train // 8) = 12 steps
    assert int(results[0]["state"].step) == 12
    assert int(state.step) < 12  # ...and the checkpoint was mid-fold

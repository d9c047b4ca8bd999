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

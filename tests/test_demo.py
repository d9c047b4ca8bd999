"""End-to-end demo CLI: wav -> mel frontend -> vmapped diverse
generation -> npz artifact, in both serving precisions."""
import json

import numpy as np
import pytest

from emotiongestures_tpu.cli import demo


@pytest.mark.slow
@pytest.mark.parametrize("precision", ["float32", "bfloat16"])
def test_demo_pipeline(tmp_path, precision):
    args = demo.build_parser().parse_args([
        "--seconds", "4", "--emotion", "happiness", "--num_samples", "2",
        "--out", str(tmp_path / precision), "--precision", precision,
    ])
    summary = demo.main(args)
    assert summary["samples"] == 2
    data = np.load(summary["out"])
    poses = data["poses"]
    assert poses.shape == (2, 60, 282)
    assert poses.dtype == np.float32
    assert np.isfinite(poses).all()
    # CVAE noise must actually diversify the two samples
    assert summary["pairwise_sample_distance"] > 0
    json.dumps(summary)  # JSON-serialisable contract

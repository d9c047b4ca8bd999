"""Faithful reproductions of reference behavioral quirks shared by the
baseline model families (kept deliberately per the quirk policy; flagged
here rather than silently "fixed")."""
from __future__ import annotations


def leaky_relu_true(x):
    """The reference writes ``nn.LeakyReLU(True)`` at 17 sites, intending
    ``inplace=True`` — but LeakyReLU's first positional parameter is
    ``negative_slope``, so the slope is ``True == 1.0`` and the activation
    is the IDENTITY function (verified against torch: LeakyReLU(True)
    maps -2.0 -> -2.0). Reproduced faithfully so weight-transplant parity
    holds (tests/test_torch_parity_baselines.py). Reference sites:
    model/embedding_net.py:57,60,149,185,192; model/motion_ae.py:48,51,
    83,90; model/multimodal_context_net.py:118,235,238; plus the
    Full_model/embedding_net.py copy."""
    return x

"""flax RNN(LSTMCell) + convert_lstm_weights vs a REAL torch nn.LSTM.

Pins the recurrence core our VidLoc is built on (gate order i/f/g/o, the
ih+hh bias combination, and reverse-direction output alignment) against
observed torch outputs (tests/golden_lstm.py, from
tools/capture_lstm_golden.py). Reference call sites:
/root/reference/models/vidloc.py:31-36.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import numpy.testing as npt
from flax import linen as nn

from geomapnet_tpu.models.torch_import import convert_lstm_weights
from geomapnet_tpu.models.torchvision_layout import _deterministic_values

sys.path.insert(0, os.path.dirname(__file__))
from golden_lstm import BI_OUT, HIDDEN, IN, N, T, UNI_OUT  # noqa: E402


def _torch_named_weights(bidirectional):
    names = ["weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0"]
    if bidirectional:
        names += [n + "_reverse" for n in names]
    shapes = {
        "weight_ih": (4 * HIDDEN, IN),
        "weight_hh": (4 * HIDDEN, HIDDEN),
        "bias_ih": (4 * HIDDEN,),
        "bias_hh": (4 * HIDDEN,),
    }
    return {
        name: _deterministic_values(
            f"lstm.{name}", shapes[name.rsplit("_l0", 1)[0]]
        )
        for name in names
    }


def _fixed_input():
    n = N * T * IN
    return (np.sin(np.arange(n, dtype=np.float64) * 0.37 + 0.2)
            ).reshape(N, T, IN).astype(np.float32)


def test_unidirectional_matches_torch():
    sd = _torch_named_weights(bidirectional=False)
    rnn = nn.RNN(nn.OptimizedLSTMCell(HIDDEN))
    params = {"cell": convert_lstm_weights(sd)}
    out = rnn.apply({"params": params}, jnp.asarray(_fixed_input()))
    npt.assert_allclose(np.asarray(out), UNI_OUT, atol=1e-6)


def test_bidirectional_matches_torch():
    """torch's bidirectional output is [fwd_t, bwd_t] per step — the same
    as our reverse=True, keep_order=True RNN concatenated after the fwd."""
    sd = _torch_named_weights(bidirectional=True)
    x = jnp.asarray(_fixed_input())
    fwd = nn.RNN(nn.OptimizedLSTMCell(HIDDEN))
    bwd = nn.RNN(nn.OptimizedLSTMCell(HIDDEN), reverse=True, keep_order=True)
    h_f = fwd.apply({"params": {"cell": convert_lstm_weights(sd)}}, x)
    h_b = bwd.apply(
        {"params": {"cell": convert_lstm_weights(sd, reverse=True)}}, x
    )
    out = jnp.concatenate([h_f, h_b], axis=-1)
    npt.assert_allclose(np.asarray(out), BI_OUT, atol=1e-6)


@pytest.mark.slow
def test_vidloc_uses_verified_core():
    """VidLoc's recurrence is exactly the verified construction above."""
    from geomapnet_tpu.models import VidLoc
    from geomapnet_tpu.models.resnet import resnet18

    model = VidLoc(feature_extractor=resnet18(), hidden_size=HIDDEN,
                   droprate=0.0)
    x = jnp.zeros((1, 2, 32, 32, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    cells = variables["params"]["lstm_fwd"]
    assert set(cells) == {"ii", "if", "ig", "io", "hi", "hf", "hg", "ho"}
    # converted torch weights drop into VidLoc's LSTM slots unchanged
    sd = _torch_named_weights(bidirectional=False)
    conv = convert_lstm_weights(sd)
    assert set(conv) == set(cells)

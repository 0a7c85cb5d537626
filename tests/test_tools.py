"""Smoke tests for aux tools: saliency, vis utils, t-SNE fallback."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geomapnet_tpu.losses import PoseNetCriterion
from geomapnet_tpu.models import PoseNet, resnet18
from geomapnet_tpu.train import create_train_state, make_optimizer


@pytest.fixture(scope="module")
def posenet_state():
    model = PoseNet(feature_extractor=resnet18(), feat_dim=32, droprate=0.0)
    tx = make_optimizer("adam", 1e-3)
    state = create_train_state(model, PoseNetCriterion(), tx,
                               jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 48, 3)))
    return model, state


class TestSaliency:
    def test_saliency_shape_and_nonnegative(self, posenet_state):
        from geomapnet_tpu.cli.plot_activations import saliency_fn

        model, state = posenet_state
        fn = saliency_fn(model, state)
        imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 48, 3))
        sal = np.asarray(fn(imgs))
        assert sal.shape == (2, 32, 48)
        assert (sal >= 0).all()
        assert sal.max() > 0  # gradients actually flow to the input

    def test_jet_colormap(self):
        from geomapnet_tpu.cli.plot_activations import _jet

        x = np.linspace(0, 1, 64).reshape(8, 8)
        rgb = _jet(x)
        assert rgb.shape == (8, 8, 3) and rgb.dtype == np.uint8
        # endpoints: low -> blue-ish, high -> red-ish
        assert rgb[0, 0, 2] > rgb[0, 0, 0]
        assert rgb[-1, -1, 0] > rgb[-1, -1, 2]


class TestVisUtils:
    def test_make_grid_tiles(self):
        from geomapnet_tpu.utils.vis import make_grid

        imgs = np.random.RandomState(0).rand(6, 16, 24, 3).astype(np.float32)
        grid = make_grid(imgs, nrow=3, padding=2)
        assert grid.shape == (2 * 18 + 2, 3 * 26 + 2, 3)
        assert grid.min() >= 0 and grid.max() <= 1

    def test_show_batch_saves(self, tmp_path):
        from geomapnet_tpu.utils.vis import show_batch

        imgs = np.random.RandomState(0).rand(4, 8, 8, 3).astype(np.float32)
        out = tmp_path / "batch.png"
        show_batch(imgs, path=str(out))
        assert out.exists() and out.stat().st_size > 0

    def test_tsne_fallback_embeds(self):
        from geomapnet_tpu.utils.vis import _tsne_np

        rng = np.random.RandomState(0)
        # two well-separated clusters must stay separated in 2-D
        X = np.concatenate([rng.randn(10, 8), rng.randn(10, 8) + 30.0])
        Y = _tsne_np(X, perplexity=5.0, n_iter=150)
        assert Y.shape == (20, 2)
        d_within = np.linalg.norm(Y[:10] - Y[:10].mean(0), axis=1).mean()
        d_between = np.linalg.norm(Y[:10].mean(0) - Y[10:].mean(0))
        assert d_between > d_within

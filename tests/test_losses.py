"""Loss criteria tests: golden values, learnability gating, online layout."""

import numpy as np
import jax
import jax.numpy as jnp

from geomapnet_tpu.losses import (
    MapNetCriterion,
    MapNetOnlineCriterion,
    PoseNetCriterion,
    l1_loss,
    quaternion_loss,
)
from geomapnet_tpu.geometry import vos_logq


def manual_weighted(s_t, s_q, pred, targ):
    lt = np.mean(np.abs(pred[..., :3] - targ[..., :3]))
    lq = np.mean(np.abs(pred[..., 3:] - targ[..., 3:]))
    return np.exp(-s_t) * lt + s_t + np.exp(-s_q) * lq + s_q


class TestPoseNetCriterion:
    def test_golden_value(self, rng):
        pred = rng.randn(4, 6).astype(np.float32)
        targ = rng.randn(4, 6).astype(np.float32)
        crit = PoseNetCriterion(sax=0.5, saq=-2.0)
        loss = float(crit(crit.init_params(), jnp.array(pred), jnp.array(targ)))
        np.testing.assert_allclose(loss, manual_weighted(0.5, -2.0, pred, targ),
                                   rtol=1e-5)

    def test_zero_at_perfect_prediction(self):
        p = jnp.ones((2, 6))
        crit = PoseNetCriterion()
        assert float(crit(crit.init_params(), p, p)) == 0.0

    def test_beta_grad_gating(self, rng):
        pred = jnp.array(rng.randn(4, 6), jnp.float32)
        targ = jnp.array(rng.randn(4, 6), jnp.float32)
        for learn, expect_nonzero in [(True, True), (False, False)]:
            crit = PoseNetCriterion(saq=-3.0, learn_beta=learn)
            g = jax.grad(lambda c: crit(c, pred, targ))(crit.init_params())
            nonzero = float(jnp.abs(g["sax"])) > 0
            assert nonzero == expect_nonzero


class TestMapNetCriterion:
    def test_golden_value(self, rng):
        pred = rng.randn(2, 3, 6).astype(np.float32)
        targ = rng.randn(2, 3, 6).astype(np.float32)
        crit = MapNetCriterion(sax=0.0, saq=-3.0, srx=0.0, srq=-3.0)
        loss = float(crit(crit.init_params(), jnp.array(pred), jnp.array(targ)))
        expect = manual_weighted(0.0, -3.0, pred.reshape(-1, 6), targ.reshape(-1, 6))
        pv = pred[:, 1:] - pred[:, :-1]
        tv = targ[:, 1:] - targ[:, :-1]
        expect += manual_weighted(0.0, -3.0, pv.reshape(-1, 6), tv.reshape(-1, 6))
        np.testing.assert_allclose(loss, expect, rtol=1e-5)

    def test_vo_term_invariant_to_constant_offset(self, rng):
        """Shifting all translations equally changes abs but not VO term."""
        targ = jnp.array(rng.randn(1, 3, 6), jnp.float32)
        pred = targ.at[..., :3].add(1.0)  # constant offset: VOs identical
        crit = MapNetCriterion()
        cp = crit.init_params()
        full = float(crit(cp, pred, targ))
        abs_only = manual_weighted(0, 0, np.asarray(pred).reshape(-1, 6),
                                   np.asarray(targ).reshape(-1, 6))
        np.testing.assert_allclose(full, abs_only, atol=1e-6)

    def test_gamma_grad_gating(self, rng):
        pred = jnp.array(rng.randn(2, 3, 6), jnp.float32)
        targ = jnp.array(rng.randn(2, 3, 6), jnp.float32)
        crit = MapNetCriterion(learn_beta=True, learn_gamma=False)
        g = jax.grad(lambda c: crit(c, pred, targ))(crit.init_params())
        assert float(jnp.abs(g["sax"])) > 0
        assert float(jnp.abs(g["srx"])) == 0


class TestMapNetOnlineCriterion:
    def test_layout_and_value(self, rng):
        """targ = [T abs | T-1 vos]; pred = 2T abs, second half -> relative."""
        T = 3
        pred = jnp.array(rng.randn(2, 2 * T, 6) * 0.3, jnp.float32)
        targ_abs = rng.randn(2, T, 6).astype(np.float32) * 0.3
        targ_vos = rng.randn(2, T - 1, 6).astype(np.float32) * 0.1
        targ = jnp.array(np.concatenate([targ_abs, targ_vos], axis=1))

        crit = MapNetOnlineCriterion()
        loss = float(crit(crit.init_params(), pred, targ))

        pred_vos = np.asarray(vos_logq(pred[:, T:]))
        expect = manual_weighted(0, 0, np.asarray(pred[:, :T]).reshape(-1, 6),
                                 targ_abs.reshape(-1, 6))
        expect += manual_weighted(0, 0, pred_vos.reshape(-1, 6),
                                  targ_vos.reshape(-1, 6))
        np.testing.assert_allclose(loss, expect, rtol=1e-5)

    def test_gps_mode(self, rng):
        """gps_mode: targ = [T abs | T gps abs], only x,y penalized, no rot VO."""
        T = 2
        pred = jnp.array(rng.randn(1, 2 * T, 6), jnp.float32)
        targ = jnp.array(rng.randn(1, 2 * T, 6), jnp.float32)
        crit = MapNetOnlineCriterion(gps_mode=True)
        loss = float(crit(crit.init_params(), pred, targ))

        expect = manual_weighted(0, 0, np.asarray(pred[:, :T]).reshape(-1, 6),
                                 np.asarray(targ[:, :T]).reshape(-1, 6))
        expect += np.mean(np.abs(np.asarray(pred[:, T:, :2]) -
                                 np.asarray(targ[:, T:, :2])))
        np.testing.assert_allclose(loss, expect, rtol=1e-5)

    def test_differentiable(self, rng):
        T = 3
        pred = jnp.array(rng.randn(1, 2 * T, 6) * 0.2, jnp.float32)
        targ = jnp.array(rng.randn(1, 2 * T - 1, 6) * 0.2, jnp.float32)
        crit = MapNetOnlineCriterion()
        g = jax.grad(
            lambda p: crit(crit.init_params(), p, targ)
        )(pred)
        assert np.all(np.isfinite(np.asarray(g)))


def test_quaternion_loss():
    q = jnp.array([[1.0, 0, 0, 0]])
    assert float(quaternion_loss(q, q)) == 0.0
    q2 = jnp.array([[0.0, 1.0, 0, 0]])
    assert float(quaternion_loss(q, q2)) == 1.0


def test_l1_is_mean_over_all_elements():
    a = jnp.zeros((2, 3))
    b = jnp.ones((2, 3)) * jnp.array([1.0, 2.0, 3.0])
    assert float(l1_loss(a, b)) == 2.0

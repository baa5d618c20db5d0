"""Lambda-game weighting math vs hand-computed numpy values (SURVEY.md §7.3.1)."""
import jax.numpy as jnp
import numpy as np
import pytest

from cglgan_tpu.algos.game import game_step

pytestmark = pytest.mark.smoke


L = np.array([0.5, 1.0, 2.0], np.float32)
BETA = np.array([0.2, 0.3, 0.5], np.float32)
LAM = 0.7


def softmax(x):
    e = np.exp(x - x.max())
    return e / e.sum()


class TestGameStep:
    def test_cgl_mean_game(self):
        out = game_step("cgl_mean_game", jnp.asarray(L), BETA, LAM)
        gamma = softmax(LAM * L)
        f_beta = (BETA * L).sum()
        f_gamma = (gamma * L).sum()
        np.testing.assert_allclose(out.w, (BETA + gamma) / 2, rtol=1e-5)
        np.testing.assert_allclose(out.f_beta, f_beta, rtol=1e-5)
        np.testing.assert_allclose(out.f_gamma, f_gamma, rtol=1e-5)
        expect_lam = LAM + 10 * ((L * L * gamma).sum() - (L * gamma).sum() * f_gamma)
        np.testing.assert_allclose(out.lam_new, expect_lam, rtol=1e-5)
        assert float(out.lam_coeff) == 0.0

    def test_cap_exp(self):
        out = game_step("cap_exp", jnp.asarray(L), BETA, LAM, lr_lambda=0.1)
        inner = softmax(LAM * L)
        np.testing.assert_allclose(out.w, softmax(inner * BETA), rtol=1e-5)
        # SGD(0.1) on F = ... - 0.001*Lambda moves Lambda up by 1e-4
        np.testing.assert_allclose(out.lam_new, LAM + 1e-4, rtol=1e-6)
        assert float(out.lam_coeff) == pytest.approx(0.001)

    def test_mix_bll(self):
        out = game_step("mix_bll", jnp.asarray(L), BETA, LAM)
        np.testing.assert_allclose(out.w, softmax(BETA * LAM * L), rtol=1e-5)
        np.testing.assert_allclose(out.lam_new, LAM + 1e-4, rtol=1e-6)

    def test_beta_gamma(self):
        out = game_step("beta_gamma", jnp.asarray(L), BETA, LAM)
        gamma = softmax(LAM * L)
        np.testing.assert_allclose(out.w, softmax(BETA * gamma), rtol=1e-5)

    def test_simple_modes(self):
        np.testing.assert_allclose(
            game_step("beta", jnp.asarray(L), BETA, LAM).w, BETA)
        np.testing.assert_allclose(
            game_step("mean", jnp.asarray(L), BETA, LAM).w, np.ones(3))
        g = game_step("gamma", jnp.asarray(L), BETA, LAM)
        np.testing.assert_allclose(g.w, softmax(LAM * L), rtol=1e-5)

    def test_weights_are_constants(self):
        """w must be detached: grad of sum(w*l) wrt l is w itself."""
        import jax

        def f(l):
            out = game_step("cap_exp", l, BETA, LAM)
            return jnp.sum(out.w * l)

        g = jax.grad(f)(jnp.asarray(L))
        out = game_step("cap_exp", jnp.asarray(L), BETA, LAM)
        np.testing.assert_allclose(g, out.w, rtol=1e-5)

    def test_unknown_mode(self):
        with pytest.raises(ValueError):
            game_step("bogus", jnp.asarray(L), BETA, LAM)

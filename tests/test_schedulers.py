"""Scheduler tests: exact-oracle recovery and table properties."""

import jax.numpy as jnp
import numpy as np

from frameino_tpu.schedulers import (CogVideoXDPMConfig, DDIMConfig,
                                     FlowMatchEulerConfig, ddim_alphas_cumprod,
                                     ddim_add_noise, ddim_step, dpm_step_pair,
                                     euler_step, flow_match_add_noise,
                                     flow_match_sigmas, get_velocity,
                                     inference_sigmas)
from frameino_tpu.schedulers.ddim import inference_timesteps


class TestFlowMatchEuler:
    CFG = FlowMatchEulerConfig()

    def test_training_sigma_table(self):
        s = flow_match_sigmas(self.CFG)
        assert s.shape == (1000,)
        assert s[0] == 1.0                     # t = N -> sigma 1 (shifted 1->1)
        assert np.all(np.diff(s) < 0)          # descending
        # shift=5: sigma(0.5) = 5*0.5/(1+4*0.5) = 0.8333
        mid = 0.5
        np.testing.assert_allclose(5 * mid / (1 + 4 * mid), 0.83333, atol=1e-4)

    def test_inference_sigmas_have_trailing_zero(self):
        s, t = inference_sigmas(self.CFG, 10)
        assert s.shape == (11,) and t.shape == (10,)
        assert s[-1] == 0.0
        np.testing.assert_allclose(t, s[:-1] * 1000, rtol=1e-6)

    def test_euler_recovers_x0_for_linear_path(self):
        """v = eps - x0 is constant along the FM path, so Euler is exact
        from any sigma down to 0 regardless of step count."""
        rng = np.random.RandomState(0)
        x0 = jnp.asarray(rng.randn(2, 3, 4).astype(np.float32))
        eps = jnp.asarray(rng.randn(2, 3, 4).astype(np.float32))
        sigmas, _ = inference_sigmas(self.CFG, 7)
        x = flow_match_add_noise(x0, eps, float(sigmas[0]))
        v = eps - x0
        for i in range(7):
            x = euler_step(x, v, float(sigmas[i]), float(sigmas[i + 1]))
        np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-5)


class TestDDIM:
    CFG = DDIMConfig()

    def test_zero_terminal_snr(self):
        ac = ddim_alphas_cumprod(self.CFG)
        assert ac.shape == (1000,)
        assert abs(ac[-1]) < 1e-12             # zero-SNR at t=999
        assert np.all(np.diff(ac) < 0)

    def test_trailing_spacing(self):
        t = inference_timesteps(self.CFG, 50)
        assert t[0] == 999 and len(t) == 50
        assert np.all(np.diff(t) == -20)

    def test_oracle_recovers_x0(self):
        """With a perfect v-prediction oracle the DDIM recursion stays on
        the (x0, eps) path and terminates exactly at x0."""
        rng = np.random.RandomState(1)
        x0 = jnp.asarray(rng.randn(1, 4, 4).astype(np.float32))
        eps = jnp.asarray(rng.randn(1, 4, 4).astype(np.float32))
        ac = jnp.asarray(ddim_alphas_cumprod(self.CFG), jnp.float32)
        steps = 10
        ts = inference_timesteps(self.CFG, steps)
        x = ddim_add_noise(ac, x0[None], eps[None], jnp.asarray([ts[0]]))[0]
        for t in ts:
            a = jnp.sqrt(ac[t])
            b = jnp.sqrt(1 - ac[t])
            v = a * eps - b * x0              # exact velocity at this t
            x = ddim_step(self.CFG, ac, x, v, jnp.asarray(t), steps)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-4)

    def test_velocity_definition(self):
        ac = jnp.asarray(ddim_alphas_cumprod(self.CFG), jnp.float32)
        rng = np.random.RandomState(2)
        x0 = jnp.asarray(rng.randn(2, 3).astype(np.float32))
        eps = jnp.asarray(rng.randn(2, 3).astype(np.float32))
        t = jnp.asarray([100, 500])
        v = get_velocity(ac, x0, eps, t)
        a = jnp.sqrt(ac[t])[:, None]
        b = jnp.sqrt(1 - ac[t])[:, None]
        np.testing.assert_allclose(np.asarray(v), np.asarray(a * eps - b * x0),
                                   atol=1e-6)


class TestDPM:
    CFG = CogVideoXDPMConfig()

    def test_oracle_recovers_x0(self):
        """Second-order multistep with an exact oracle also lands on x0
        (denoised_d collapses to x0 when consecutive estimates agree)."""
        rng = np.random.RandomState(3)
        x0 = jnp.asarray(rng.randn(1, 4).astype(np.float32))
        eps = jnp.asarray(rng.randn(1, 4).astype(np.float32))
        ac = jnp.asarray(ddim_alphas_cumprod(self.CFG), jnp.float32)
        steps = 10
        ts = inference_timesteps(self.CFG, steps)
        x = ddim_add_noise(ac, x0[None], eps[None], jnp.asarray([ts[0]]))[0]
        old = None
        t_back = None
        for t in ts:
            a = jnp.sqrt(ac[t])
            b = jnp.sqrt(1 - ac[t])
            v = a * eps - b * x0
            x, old = dpm_step_pair(self.CFG, ac, x, v, jnp.asarray(t),
                                   None if t_back is None else jnp.asarray(t_back),
                                   old, steps)
            t_back = t
        assert np.isfinite(np.asarray(x)).all()
        np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-3)

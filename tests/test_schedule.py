"""Golden-value tests for the DDPM schedule buffers
(diff-tested against an independent numpy recompute of the reference math,
reference gaussian_diffusion.py:7-52)."""
import numpy as np
import pytest

from npcd_tpu.models.diffusion.schedule import extract, get_beta_schedule, make_schedule


def test_linear_beta_endpoints():
    betas = get_beta_schedule("linear", num_diffusion_steps=1000)
    assert betas.shape == (1000,)
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(0.02)
    assert np.all(np.diff(betas) > 0)


def test_schedule_buffers_match_numpy():
    s = make_schedule()
    betas = np.linspace(1e-4, 0.02, 1000)
    alphas_cumprod = np.cumprod(1.0 - betas)
    np.testing.assert_allclose(np.asarray(s.alphas_cumprod), alphas_cumprod, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s.sqrt_alphas_cumprod), np.sqrt(alphas_cumprod), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(s.sqrt_one_minus_alphas_cumprod),
        np.sqrt(1 - alphas_cumprod),
        rtol=1e-6,
    )
    prev = np.append(1.0, alphas_cumprod[:-1])
    post_var = betas * (1 - prev) / (1 - alphas_cumprod)
    np.testing.assert_allclose(np.asarray(s.posterior_variance), post_var, rtol=1e-5)
    # the t=0 entry of the clipped log variance equals the t=1 entry
    plvc = np.asarray(s.posterior_log_variance_clipped)
    assert plvc[0] == plvc[1]
    np.testing.assert_allclose(plvc[1:], np.log(post_var[1:]), rtol=1e-5)


def test_posterior_mean_coefs():
    """coef1/coef2 match an independent float64 recompute; at t=0 (the
    q(x_0|x_1, x_0) step) they are exactly (1, 0) scaled by 1/(1-beta_1)...
    i.e. coef1 = beta_1/(1-alpha_1) = 1, coef2 = 0."""
    s = make_schedule()
    betas = np.linspace(1e-4, 0.02, 1000)
    acp = np.cumprod(1 - betas)
    prev = np.append(1.0, acp[:-1])
    coef1 = betas * np.sqrt(prev) / (1 - acp)
    coef2 = (1 - prev) * np.sqrt(1 - betas) / (1 - acp)
    np.testing.assert_allclose(np.asarray(s.posterior_mean_coef1), coef1, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s.posterior_mean_coef2), coef2, rtol=1e-4, atol=1e-7)
    assert float(s.posterior_mean_coef1[0]) == pytest.approx(1.0)
    assert float(s.posterior_mean_coef2[0]) == 0.0


def test_extract_shapes():
    import jax.numpy as jnp

    s = make_schedule()
    t = jnp.array([0, 10, 999])
    out = extract(s.betas, t, 3)
    assert out.shape == (3, 1, 1)
    np.testing.assert_allclose(
        np.asarray(out[:, 0, 0]), np.asarray(s.betas)[np.array([0, 10, 999])]
    )

"""DDPM process tests (reference gaussian_diffusion.py semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npcd_tpu.models.diffusion.gaussian_diffusion import GaussianDiffusion
from npcd_tpu.models.diffusion.schedule import make_schedule


@pytest.fixture(scope="module")
def gd():
    return GaussianDiffusion()


def test_q_sample_closed_form(gd):
    x0 = jnp.ones((2, 3, 4))
    noise = jnp.full((2, 3, 4), 0.5)
    t = jnp.array([0, 999])
    xt = np.asarray(gd.q_sample(x0, t, noise))
    s = gd.schedule
    for i, ti in enumerate([0, 999]):
        expected = (
            float(s.sqrt_alphas_cumprod[ti]) * 1.0
            + float(s.sqrt_one_minus_alphas_cumprod[ti]) * 0.5
        )
        np.testing.assert_allclose(xt[i], expected, rtol=1e-6)


def test_q_sample_next_closed_form(gd):
    """Matches reference gaussian_diffusion.py:78-89 (noise scaled by beta_t,
    not sqrt(beta_t), exactly as the reference computes it)."""
    xt = jnp.ones((2, 3, 4))
    noise = jnp.full((2, 3, 4), 0.5)
    t = jnp.array([0, 999])
    out = np.asarray(gd.q_sample_next(xt, t, noise))
    s = gd.schedule
    for i, ti in enumerate([0, 999]):
        expected = float(s.sqrt_one_minus_betas[ti]) * 1.0 + float(s.betas[ti]) * 0.5
        np.testing.assert_allclose(out[i], expected, rtol=1e-6)


def test_xstart_eps_roundtrip(gd):
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (4, 3, 8))
    eps = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 8))
    t = jnp.array([1, 10, 500, 998])
    xt = gd.q_sample(x0, t, eps)
    x0_rec = gd.predict_xstart_from_eps(xt, t, eps)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), rtol=1e-3, atol=1e-4)
    eps_rec = gd.predict_eps_from_xstart(xt, t, x0)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(eps), rtol=1e-2, atol=1e-3)


def test_p_losses_perfect_denoiser_is_zero(gd):
    """A denoiser that returns the true noise gives zero loss."""
    x0_c = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8))
    x0_f = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8))
    t = jnp.array([5, 700])

    captured = {}

    def oracle(coords_t, feats_t, tt):
        # reconstruct the true eps from the known x0
        eps_c = gd.predict_eps_from_xstart(coords_t, tt, x0_c)
        eps_f = gd.predict_eps_from_xstart(feats_t, tt, x0_f)
        return eps_c, eps_f

    loss, subs, _ = gd.p_losses(jax.random.PRNGKey(2), oracle, x0_c, x0_f, t)
    assert float(loss) < 1e-6


def test_p_losses_zero_denoiser_mean(gd):
    """eps-prediction of 0 -> loss = E[eps^2]/2 * 2 halves ~ 1/2 + 1/2 = 1."""
    zero = lambda c, f, t: (jnp.zeros_like(c), jnp.zeros_like(f))
    x0_c = jnp.zeros((8, 3, 64))
    x0_f = jnp.zeros((8, 4, 64))
    t = jnp.arange(8) * 100
    loss, _, _ = gd.p_losses(jax.random.PRNGKey(0), zero, x0_c, x0_f, t)
    assert float(loss) == pytest.approx(1.0, rel=0.1)


def test_p_sample_t0_deterministic(gd):
    """At t=0 no noise is added: output equals the posterior mean."""
    zero = lambda c, f, t: (jnp.zeros_like(c), jnp.zeros_like(f))
    c = jnp.ones((1, 3, 4))
    f = jnp.ones((1, 2, 4))
    t = jnp.array([0])
    o1 = gd.p_sample(jax.random.PRNGKey(0), zero, c, f, t)
    o2 = gd.p_sample(jax.random.PRNGKey(1), zero, c, f, t)
    np.testing.assert_allclose(np.asarray(o1.coords), np.asarray(o2.coords))


def test_p_sample_loop_shapes_and_clipping():
    # explicit endpoints: the reference's T-scaled defaults exceed 1 for tiny T
    sched = make_schedule(num_diffusion_steps=10, beta_start=1e-4, beta_end=0.02)
    gd = GaussianDiffusion(sched)
    zero = lambda c, f, t: (jnp.zeros_like(c), jnp.zeros_like(f))
    c0 = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8))
    f0 = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8))
    c, f = gd.p_sample_loop(
        jax.random.PRNGKey(2), zero, c0, f0,
        coords_clip_range=(-0.1, 0.1), feats_clip_range=(-0.2, 0.2),
    )
    assert c.shape == (2, 3, 8) and f.shape == (2, 4, 8)
    assert np.isfinite(np.asarray(c)).all()


def test_vb_terms_finite(gd):
    zero = lambda c, f, t: (jnp.zeros_like(c), jnp.zeros_like(f))
    c0 = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4)) * 0.1
    f0 = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 4)) * 0.1
    t = jnp.array([0, 500])
    ct = gd.q_sample(c0, t, jnp.zeros_like(c0))
    ft = gd.q_sample(f0, t, jnp.zeros_like(f0))
    kl_c, _, kl_f, _ = gd._vb_terms_bpd(zero, c0, ct, f0, ft, t)
    assert np.isfinite(np.asarray(kl_c)).all() and np.isfinite(np.asarray(kl_f)).all()


def test_calc_bpd_loop_perfect_denoiser():
    """With an oracle denoiser that returns the exact noise, the posterior
    matches q exactly: KL terms ~0, eps-MSE ~0, total_bpd ~ prior + decoder
    NLL at t=0."""
    import numpy as np
    from npcd_tpu.models.diffusion.schedule import make_schedule
    from npcd_tpu.models.diffusion.gaussian_diffusion import GaussianDiffusion

    gd = GaussianDiffusion(make_schedule(num_diffusion_steps=50))
    rng = jax.random.PRNGKey(0)
    x0_c = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8)) * 0.1
    x0_f = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8)) * 0.1

    s = gd.schedule

    def oracle(coords_t, feats_t, t):
        # exact eps implied by (x_t, x_0)
        def eps(x_t, x_0):
            a = x_t - jnp.reshape(s.sqrt_alphas_cumprod[t], (-1, 1, 1)) * x_0
            return a / jnp.reshape(s.sqrt_one_minus_alphas_cumprod[t], (-1, 1, 1))
        return eps(coords_t, x0_c), eps(feats_t, x0_f)

    out = jax.jit(lambda r: gd.calc_bpd_loop(r, oracle, x0_c, x0_f))(rng)
    assert out["vb_coords"].shape == (2, 50)
    assert out["total_bpd_coords"].shape == (2,)
    # all KL terms except t=0 (decoder NLL) vanish for the oracle
    np.testing.assert_allclose(np.asarray(out["vb_coords"][:, :-1]), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["mse_coords"]), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["xstart_mse_feats"]), 0.0, atol=1e-4)
    # total = sum(vb) + prior, by construction
    np.testing.assert_allclose(
        np.asarray(out["total_bpd_feats"]),
        np.asarray(out["vb_feats"].sum(1) + out["prior_bpd_feats"]),
        rtol=1e-6,
    )


def test_p_sample_loop_trajectory_matches_final():
    """return_trajectory collects states without changing the final sample
    (reference p_sample_loop_trajectory, gaussian_diffusion.py:148-177)."""
    sched = make_schedule(num_diffusion_steps=12, beta_start=1e-4, beta_end=0.02)
    gd = GaussianDiffusion(sched)
    # a non-trivial denoiser so intermediate states actually evolve
    fn = lambda c, f, t: (0.1 * c, 0.1 * f)
    c0 = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8))
    f0 = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8))
    rng = jax.random.PRNGKey(2)

    c_ref, f_ref = gd.p_sample_loop(rng, fn, c0, f0)
    c, f, traj = gd.p_sample_loop(rng, fn, c0, f0, return_trajectory=True)

    # identical rng consumption -> bit-equal final sample
    np.testing.assert_array_equal(np.asarray(c), np.asarray(c_ref))
    np.testing.assert_array_equal(np.asarray(f), np.asarray(f_ref))

    assert traj.coords_ts.shape == (13, 2, 3, 8)
    assert traj.feats_ts.shape == (13, 2, 4, 8)
    assert traj.coords_recons.shape == (12, 2, 3, 8)
    assert traj.feats_recons.shape == (12, 2, 4, 8)
    np.testing.assert_array_equal(np.asarray(traj.coords_ts[0]), np.asarray(c0))
    np.testing.assert_array_equal(np.asarray(traj.coords_ts[-1]), np.asarray(c))
    np.testing.assert_array_equal(np.asarray(traj.feats_ts[-1]), np.asarray(f))


def test_p_sample_loop_trajectory_stride():
    sched = make_schedule(num_diffusion_steps=12, beta_start=1e-4, beta_end=0.02)
    gd = GaussianDiffusion(sched)
    fn = lambda c, f, t: (0.1 * c, 0.1 * f)
    c0 = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8))
    f0 = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8))
    rng = jax.random.PRNGKey(2)

    c1, f1, dense = gd.p_sample_loop(rng, fn, c0, f0, return_trajectory=True)
    c4, f4, strided = gd.p_sample_loop(
        rng, fn, c0, f0, return_trajectory=True, trajectory_stride=4
    )
    np.testing.assert_array_equal(np.asarray(c4), np.asarray(c1))
    assert strided.coords_ts.shape == (4, 2, 3, 8)  # start + 3 collected
    # strided frames are every 4th dense frame
    np.testing.assert_array_equal(
        np.asarray(strided.coords_ts), np.asarray(dense.coords_ts[::4])
    )
    np.testing.assert_array_equal(
        np.asarray(strided.coords_recons), np.asarray(dense.coords_recons[3::4])
    )

    with pytest.raises(ValueError):
        gd.p_sample_loop(rng, fn, c0, f0, return_trajectory=True, trajectory_stride=5)


def test_generate_return_trajectory():
    from npcd_tpu.models.diffusion import DiffusionModel
    from npcd_tpu.models.diffusion.gaussian_diffusion import GaussianDiffusion as GD

    model = DiffusionModel(coords_dim=3, feats_dim=4, num_points=8,
                           width=16, layers=1, heads=2, attn_impl="einsum")
    model.process = GD(make_schedule(num_diffusion_steps=6, beta_start=1e-4, beta_end=0.02))
    state = model.init(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    c_ref, f_ref = model.generate(state, rng, num=5, batch_size=3)
    c, f, traj = model.generate(
        state, rng, num=5, batch_size=3, return_trajectory=True,
        trajectory_stride=2,
    )
    np.testing.assert_array_equal(c, c_ref)
    np.testing.assert_array_equal(f, f_ref)
    assert traj.coords_ts.shape == (4, 5, 3, 8)  # start + 3 strided frames
    assert traj.feats_recons.shape == (3, 5, 4, 8)

"""Denoiser tests (reference transformer.py semantics)."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from npcd_tpu.models.diffusion.transformer import NPCDTransformer, timestep_embedding


def _tiny():
    return NPCDTransformer(
        coords_dim=3, feats_dim=4, width=32, layers=2, heads=4, attn_impl="einsum"
    )


def test_timestep_embedding_golden():
    t = jnp.array([0.0, 5.0])
    dim = 8
    emb = np.asarray(timestep_embedding(t, dim))
    half = dim // 2
    freqs = np.exp(-math.log(10000) * np.arange(half) / half)
    args = np.asarray(t)[:, None] * freqs[None]
    expected = np.concatenate([np.cos(args), np.sin(args)], -1)
    np.testing.assert_allclose(emb, expected, rtol=1e-5)


def test_zero_init_output():
    m = _tiny()
    coords = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8))
    feats = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8))
    t = jnp.array([3, 100])
    params = m.init(jax.random.PRNGKey(0), coords, feats, t)["params"]
    eps_c, eps_f = m.apply({"params": params}, coords, feats, t)
    # output projection is zero-initialized -> exactly zero prediction at init
    assert eps_c.shape == (2, 3, 8) and eps_f.shape == (2, 4, 8)
    assert np.abs(np.asarray(eps_c)).max() == 0.0
    assert np.abs(np.asarray(eps_f)).max() == 0.0


def test_permutation_equivariance():
    """No positional encoding over points -> permuting the points permutes
    the prediction identically (the architectural property that makes the
    denoiser a point-cloud model)."""
    m = _tiny()
    rng = jax.random.PRNGKey(0)
    coords = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 8))
    feats = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8))
    t = jnp.array([7])
    params = m.init(rng, coords, feats, t)["params"]
    # make outputs nonzero (random perturbation — a constant one would be
    # nulled by the zero-mean LayerNorm outputs feeding output_proj)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [p + 0.02 * jax.random.normal(k, p.shape) for p, k in zip(leaves, keys)],
    )
    perm = jnp.array([3, 1, 0, 2, 7, 6, 5, 4])
    out_c, out_f = m.apply({"params": params}, coords, feats, t)
    pout_c, pout_f = m.apply(
        {"params": params}, coords[:, :, perm], feats[:, :, perm], t
    )
    np.testing.assert_allclose(
        np.asarray(out_c[:, :, perm]), np.asarray(pout_c), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_f[:, :, perm]), np.asarray(pout_f), rtol=2e-4, atol=2e-5
    )


def test_time_token_changes_output():
    m = _tiny()
    coords = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 8))
    feats = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8))
    params = m.init(jax.random.PRNGKey(0), coords, feats, jnp.array([0]))["params"]
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [p + 0.02 * jax.random.normal(k, p.shape) for p, k in zip(leaves, keys)],
    )
    o1, _ = m.apply({"params": params}, coords, feats, jnp.array([1]))
    o2, _ = m.apply({"params": params}, coords, feats, jnp.array([900]))
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-6


def test_param_count_formula():
    """Parameter count matches the analytic formula (SURVEY.md §2.11)."""
    w, layers, c = 32, 2, 7  # width, layers, in/out channels
    m = _tiny()
    coords = jnp.zeros((1, 3, 8))
    feats = jnp.zeros((1, 4, 8))
    params = m.init(jax.random.PRNGKey(0), coords, feats, jnp.array([0]))["params"]
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    block = (w * 3 * w + 3 * w) + (w * w + w) + (w * 4 * w + 4 * w) + (4 * w * w + w) + 4 * w
    time_embed = (w * 4 * w + 4 * w) + (4 * w * w + w)
    io = (c * w + w) + (w * c + c)
    lns = 3 * 2 * w  # ln_pre, ln_post + per-block lns counted in block
    expected = layers * block + time_embed + io + 2 * 2 * w
    assert n == expected, (n, expected)


def _perturbed_params(m, coords, feats):
    params = m.init(jax.random.PRNGKey(0), coords, feats, jnp.array([0]))["params"]
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef,
        [p + 0.02 * jax.random.normal(k, p.shape) for p, k in zip(leaves, keys)],
    )


def test_gelu_flavor_wiring():
    """gelu="tanh" must actually reach the block MLPs (differ from erf) while
    staying a close approximation; "auto" resolves to erf for f32 compute."""
    kw = dict(coords_dim=3, feats_dim=4, width=32, layers=2, heads=4,
              attn_impl="einsum")
    coords = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 8))
    feats = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8))
    t = jnp.array([7])
    m_erf = NPCDTransformer(**kw, gelu="erf")
    params = _perturbed_params(m_erf, coords, feats)
    o_erf = m_erf.apply({"params": params}, coords, feats, t)
    o_tanh = NPCDTransformer(**kw, gelu="tanh").apply(
        {"params": params}, coords, feats, t)
    d = max(np.abs(np.asarray(a) - np.asarray(b)).max()
            for a, b in zip(o_erf, o_tanh))
    assert d > 0.0, "tanh flag did not reach the MLP"
    assert d < 1e-3, f"tanh approximation too far from erf: {d}"
    # auto == erf for f32 compute (bit-identical)
    o_auto = NPCDTransformer(**kw, gelu="auto").apply(
        {"params": params}, coords, feats, t)
    for a, b in zip(o_erf, o_auto):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # auto == tanh for bf16 compute (bit-identical)
    kw16 = dict(kw, dtype=jnp.bfloat16)
    o16_auto = NPCDTransformer(**kw16, gelu="auto").apply(
        {"params": params}, coords, feats, t)
    o16_tanh = NPCDTransformer(**kw16, gelu="tanh").apply(
        {"params": params}, coords, feats, t)
    for a, b in zip(o16_auto, o16_tanh):
        assert np.array_equal(np.asarray(a), np.asarray(b))

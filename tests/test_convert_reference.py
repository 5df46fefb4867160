"""Weight-converter tests: a minimal torch oracle of the reference denoiser
block math validates layout decisions (qkv fusion/split, Dense transpose,
LayerNorm eps, exact GELU, timestep embedding) through the converter."""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from npcd_tpu.models.diffusion.transformer import NPCDTransformer
from npcd_tpu.utils.convert_reference import (
    convert_denoiser_params,
    convert_pointnerf_params,
)

W, H, LAYERS, CD, FD, P = 32, 4, 2, 3, 4, 8


def _torch_denoiser_state(seed=0):
    """Random state dict with the reference's key naming."""
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def lin(name, d_in, d_out, zero=False):
        w = torch.zeros(d_out, d_in) if zero else torch.randn(d_out, d_in, generator=g) * 0.05
        b = torch.zeros(d_out) if zero else torch.randn(d_out, generator=g) * 0.02
        sd[f"{name}.weight"] = w
        sd[f"{name}.bias"] = b

    def ln(name, d):
        sd[f"{name}.weight"] = 1 + 0.1 * torch.randn(d, generator=g)
        sd[f"{name}.bias"] = 0.1 * torch.randn(d, generator=g)

    pre = "diffusion.denoiser."
    lin(pre + "input_proj", CD + FD, W)
    lin(pre + "output_proj", W, CD + FD)
    ln(pre + "ln_pre", W)
    ln(pre + "ln_post", W)
    lin(pre + "time_embed.c_fc", W, 4 * W)
    lin(pre + "time_embed.c_proj", 4 * W, W)
    for i in range(LAYERS):
        b = pre + f"backbone.resblocks.{i}."
        ln(b + "ln_1", W)
        ln(b + "ln_2", W)
        lin(b + "attn.c_qkv", W, 3 * W)
        lin(b + "attn.c_proj", W, W)
        lin(b + "mlp.c_fc", W, 4 * W)
        lin(b + "mlp.c_proj", 4 * W, W)
    return sd


def _torch_forward(sd, coords, feats, t):
    """Reference denoiser math re-derived in torch (oracle for the layout)."""
    pre = "diffusion.denoiser."

    def lin(name, x):
        return x @ sd[f"{name}.weight"].T + sd[f"{name}.bias"]

    def lnorm(name, x):
        return torch.nn.functional.layer_norm(
            x, (x.shape[-1],), sd[f"{name}.weight"], sd[f"{name}.bias"], 1e-5
        )

    x = torch.cat([coords, feats], dim=1).permute(0, 2, 1)  # [N, P, C]
    h = lin(pre + "input_proj", x)

    half = W // 2
    freqs = torch.exp(-math.log(10000) * torch.arange(half, dtype=torch.float32) / half)
    args = t[:, None].float() * freqs[None]
    emb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    t_tok = lin(pre + "time_embed.c_proj",
                torch.nn.functional.gelu(lin(pre + "time_embed.c_fc", emb)))
    h = torch.cat([t_tok[:, None], h], dim=1)

    h = lnorm(pre + "ln_pre", h)
    n, s, _ = h.shape
    for i in range(LAYERS):
        b = pre + f"backbone.resblocks.{i}."
        y = lnorm(b + "ln_1", h)
        qkv = lin(b + "attn.c_qkv", y).view(n, s, H, -1)
        q, k, v = torch.split(qkv, W // H, dim=-1)
        scale = 1 / math.sqrt(math.sqrt(W // H))
        att = torch.einsum("bthc,bshc->bhts", q * scale, k * scale)
        att = torch.softmax(att, dim=-1)
        out = torch.einsum("bhts,bshc->bthc", att, v).reshape(n, s, W)
        h = h + lin(b + "attn.c_proj", out)
        y = lnorm(b + "ln_2", h)
        h = h + lin(b + "mlp.c_proj", torch.nn.functional.gelu(lin(b + "mlp.c_fc", y)))
    h = lnorm(pre + "ln_post", h)[:, 1:]
    out = lin(pre + "output_proj", h).permute(0, 2, 1)
    return out[:, :CD], out[:, CD:]


def test_converted_denoiser_matches_torch_oracle():
    sd = _torch_denoiser_state()
    params = convert_denoiser_params(
        {k: v.numpy() for k, v in sd.items()}, layers=LAYERS, heads=H
    )

    model = NPCDTransformer(coords_dim=CD, feats_dim=FD, width=W,
                            layers=LAYERS, heads=H, attn_impl="einsum")
    coords = np.random.default_rng(1).normal(size=(2, CD, P)).astype(np.float32)
    feats = np.random.default_rng(2).normal(size=(2, FD, P)).astype(np.float32)
    t = np.array([3, 700])

    with torch.no_grad():
        tc, tf = _torch_forward(sd, torch.from_numpy(coords), torch.from_numpy(feats),
                                torch.from_numpy(t))
    jc, jf = model.apply({"params": params}, jnp.asarray(coords), jnp.asarray(feats),
                         jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(jc), tc.numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(jf), tf.numpy(), rtol=2e-4, atol=2e-5)


def test_converted_denoiser_grouped_layout_matches_torch_oracle():
    """qkv_groups=2 (the flagship default is G=2 at 16 heads / D=64): the
    grouped column permutation in the converter must agree with the model's
    grouped einsum split."""
    sd = _torch_denoiser_state(seed=5)
    params = convert_denoiser_params(
        {k: v.numpy() for k, v in sd.items()}, layers=LAYERS, heads=H,
        qkv_groups=2,
    )
    model = NPCDTransformer(coords_dim=CD, feats_dim=FD, width=W,
                            layers=LAYERS, heads=H, attn_impl="einsum",
                            qkv_groups=2)
    coords = np.random.default_rng(6).normal(size=(2, CD, P)).astype(np.float32)
    feats = np.random.default_rng(7).normal(size=(2, FD, P)).astype(np.float32)
    t = np.array([12, 450])

    with torch.no_grad():
        tc, tf = _torch_forward(sd, torch.from_numpy(coords), torch.from_numpy(feats),
                                torch.from_numpy(t))
    jc, jf = model.apply({"params": params}, jnp.asarray(coords), jnp.asarray(feats),
                         jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(jc), tc.numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(jf), tf.numpy(), rtol=2e-4, atol=2e-5)


def test_relayout_qkv_roundtrip_and_equivalence():
    """relayout_qkv migrates between group counts: converting reference
    weights at G=a then relayouting a->b equals converting at G=b directly;
    a->b->a is the identity."""
    from npcd_tpu.utils.convert_reference import (
        _permute_qkv_grouped,
        relayout_qkv,
    )

    rng = np.random.default_rng(8)
    heads, d, d_in = 4, 8, 16
    w3 = 3 * heads * d
    kernel = rng.normal(size=(d_in, w3)).astype(np.float32)
    bias = rng.normal(size=(w3,)).astype(np.float32)

    for a, b in [(1, 2), (2, 4), (4, 1)]:
        ka, ba = _permute_qkv_grouped(kernel, bias, heads, a)
        kb, bb = _permute_qkv_grouped(kernel, bias, heads, b)
        kab, bab = relayout_qkv(ka, ba, heads, a, b)
        np.testing.assert_array_equal(kab, kb)
        np.testing.assert_array_equal(bab, bb)
        kaba, baba = relayout_qkv(kab, bab, heads, b, a)
        np.testing.assert_array_equal(kaba, ka)
        np.testing.assert_array_equal(baba, ba)


def test_convert_pointnerf_shapes():
    n_obj, pts, fd = 3, 8, 4
    sd = {
        "pointnerf.coords._extra_state": {"emb": {"weight": np.zeros((n_obj, pts * 3))}},
        "pointnerf.feats._extra_state": {"emb": {"weight": np.zeros((n_obj, pts * 2 * fd))}},
    }
    for name, dims in [
        ("field.aggregator.local_field", [(95, 256), (256, 256), (256, 256), (256, 256), (256, 256)]),
        ("field.shape_net", [(256, 256), (256, 1)]),
        ("field.channel_net", [(256, 256), (256, 256), (256, 256), (256, 256), (256, 3)]),
    ]:
        for i, (di, do) in enumerate(dims):
            sd[f"pointnerf.{name}.{2*i}.weight"] = np.zeros((do, di), np.float32)
            sd[f"pointnerf.{name}.{2*i}.bias"] = np.zeros((do,), np.float32)

    params = convert_pointnerf_params(sd, n_obj=n_obj, num_points=pts, feat_dim=fd)
    assert params["coords_table"].shape == (n_obj, pts, 3)
    assert params["feats_table"].shape == (n_obj, pts, 2 * fd)
    assert params["aggregator"]["local_field"][0]["w"].shape == (95, 256)
    assert params["field"]["shape_net"][1]["w"].shape == (256, 1)
    assert params["field"]["channel_net"][-1]["b"].shape == (3,)

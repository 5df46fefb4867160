"""PointNeRF render-path numerical oracle vs the reference math.

Re-derives the reference's eval render pipeline in torch — pure-tensor
fallback aggregator kNN (reference aggregator.py:42-58), MLP aggregation
with inverse-distance weights (aggregators/mlp.py:36-125), density/color
heads (fields/mlp.py:39-71, field.py:62-75,113-141), shading-point depths +
alpha compositing (renderer.py:96-110,120-185, volume_renderer.py:23-39),
pinhole ray generation (ray_sampler.py:10-49) and ray-AABB limits
(math_utils.py:46-97) — and asserts pixel-level agreement with the
npcd_tpu dense fixed-shape render on a tiny scene, with identical weights
pushed through both via the torch->jax converter.

This is the end-to-end guard for PSNR parity: any deviation in kNN
semantics, weighting, density activation, depth fixing, or compositing
shows up here as a per-pixel mismatch.
"""
import dataclasses

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from npcd_tpu.models.pointnerf import PointNeRF, PointNeRFRenderConfig
from npcd_tpu.utils.config import pointnerf_default_options
from npcd_tpu.utils.convert_reference import convert_pointnerf_params

P, FD, K, M, DRES, RES = 24, 8, 4, 6, 24, 16
NFREQ = 4
HID = 16
R_ABS = 0.25  # absolute neighbor radius
SEED = 0

torch.manual_seed(SEED)


# --------------------------------------------------------------------------
# torch oracle, following the reference line by line
# --------------------------------------------------------------------------


def _pos_enc(x, n_freqs):
    """PositionalEncoder1D (reference positional_encoder.py:7-23)."""
    freq = (2 ** torch.arange(n_freqs, dtype=torch.float32)) * torch.pi
    spectrum = x[..., None] * freq
    enc = torch.cat([spectrum.sin(), spectrum.cos()], dim=-1).flatten(-2)
    return torch.cat([x, enc], dim=-1)


def _mlp(state, prefix, n_linear, x):
    """define_mlp Sequential: Linear (+LeakyReLU) pairs, final Linear
    (reference model.py:22-36)."""
    for i in range(n_linear):
        w = state[f"{prefix}.{2 * i}.weight"]
        b = state[f"{prefix}.{2 * i}.bias"]
        x = x @ w.T + b
        if i < n_linear - 1:
            x = F.leaky_relu(x, 0.01)
    return x


def _ray_sampler(extr, intr, resolution):
    """Pinhole back-projection (reference ray_sampler.py:10-49)."""
    b = extr.shape[0]
    fx, fy = intr[:, 0, 0], intr[:, 1, 1]
    cx, cy, sk = intr[:, 0, 2], intr[:, 1, 2], intr[:, 0, 1]
    u = torch.arange(resolution, dtype=torch.float32) + 0.5
    uv = torch.stack(torch.meshgrid(u, u, indexing="ij")).flip(0).reshape(2, -1).T
    uv = uv[None].repeat(b, 1, 1)
    x_cam, y_cam = uv[..., 0], uv[..., 1]
    z = torch.ones_like(x_cam)
    x_lift = (x_cam - cx[:, None] + cy[:, None] * sk[:, None] / fy[:, None]
              - sk[:, None] * y_cam / fy[:, None]) / fx[:, None] * z
    y_lift = (y_cam - cy[:, None]) / fy[:, None] * z
    cam_points = torch.stack([x_lift, y_lift, z], dim=-1)

    cam2world = extr.clone()
    cam2world[:, :3, :3] = extr[:, :3, :3].transpose(-1, -2)
    cam2world[:, :3, 3:] = -torch.matmul(cam2world[:, :3, :3], extr[:, :3, 3:])
    cam_loc = cam2world[:, :3, 3]
    hom = torch.cat([cam_points, torch.ones_like(cam_points[..., :1])], dim=-1)
    world = torch.bmm(cam2world, hom.permute(0, 2, 1)).permute(0, 2, 1)[..., :3]
    dirs = F.normalize(world - cam_loc[:, None], dim=2)
    origins = cam_loc[:, None].repeat(1, dirs.shape[1], 1)
    return origins, dirs


def _ray_limits_box(rays_o, rays_d, box_size):
    """Slab ray-AABB intersection (reference math_utils.py:46-97)."""
    sh = rays_o.shape
    o = rays_o.reshape(-1, 3)
    d = rays_d.reshape(-1, 3)
    bounds = torch.tensor([[-box_size] * 3, [box_size] * 3])
    valid = torch.ones(o.shape[0], dtype=torch.bool)
    inv = 1.0 / d
    sign = (inv < 0).long()
    tmin = (bounds[sign[:, 0], 0] - o[:, 0]) * inv[:, 0]
    tmax = (bounds[1 - sign[:, 0], 0] - o[:, 0]) * inv[:, 0]
    tymin = (bounds[sign[:, 1], 1] - o[:, 1]) * inv[:, 1]
    tymax = (bounds[1 - sign[:, 1], 1] - o[:, 1]) * inv[:, 1]
    valid &= ~((tmin > tymax) | (tymin > tmax))
    tmin, tmax = torch.max(tmin, tymin), torch.min(tmax, tymax)
    tzmin = (bounds[sign[:, 2], 2] - o[:, 2]) * inv[:, 2]
    tzmax = (bounds[1 - sign[:, 2], 2] - o[:, 2]) * inv[:, 2]
    valid &= ~((tmin > tzmax) | (tzmin > tmax))
    tmin, tmax = torch.max(tmin, tzmin), torch.min(tmax, tzmax)
    tmin[~valid], tmax[~valid] = -1.0, -2.0
    return tmin.reshape(*sh[:-1], 1), tmax.reshape(*sh[:-1], 1)


def _oracle_render(state, coords, feats, extr, intr):
    """Full eval render (sample=False) on [1, V] views; reference
    renderer.py:202-268 + volume_renderer.py:41-92 with the pure-tensor
    fallback aggregator."""
    v = extr.shape[0]
    rays_o, rays_d = _ray_sampler(extr, intr, RES)  # [V, R, 3]
    num_rays = rays_o.shape[1]

    ray_start, ray_end = _ray_limits_box(rays_o, rays_d, 1.0)
    is_valid = ray_end > ray_start
    ray_start[~is_valid] = ray_start[is_valid].min()
    ray_end[~is_valid] = ray_end[is_valid].max()

    # uniform inclusive depth samples (renderer.py:49-77, eval: no jitter)
    steps = torch.arange(DRES, dtype=torch.float32) / (DRES - 1)
    depths = ray_start[..., None, :] + steps.view(1, 1, -1, 1) * (
        ray_end - ray_start)[..., None, :]  # [V, R, S, 1]

    x = rays_o[:, :, None, :] + depths * rays_d[:, :, None, :]  # [V, R, S, 3]

    # fallback kNN (aggregator.py:42-58); instances = views, one shared cloud
    kp_pos = coords[None].repeat(v, 1, 1)  # [V, P, 3]
    dist = torch.cdist(x.reshape(v, -1, 3), kp_pos).view(v, num_rays, DRES, P)
    topk = torch.topk(dist, K, dim=-1, largest=False, sorted=False)
    valid_neighbor = topk.values < R_ABS
    neighbor_idx = topk.indices + P * torch.arange(v).view(-1, 1, 1, 1)
    neighbor_idx[~valid_neighbor] = -1
    valid_pts = valid_neighbor.any(-1, keepdim=True)
    cums = torch.cumsum(valid_pts, dim=-2)
    valid_pts = valid_pts & (cums <= M)

    neighbor_idx = torch.masked_select(neighbor_idx, valid_pts).view(-1, K)
    shading_pts = torch.masked_select(x, valid_pts).view(-1, 3)
    num_valid = valid_pts.sum(-2, keepdim=True)
    mask = torch.arange(M).view(1, 1, -1, 1) < num_valid  # [V, R, M, 1]

    # aggregator MLP (aggregators/mlp.py:36-125)
    valid_mask = neighbor_idx >= 0
    neighbor_idx = neighbor_idx.clone()
    neighbor_idx[~valid_mask] = 0
    kp_feat = feats[None].repeat(v, 1, 1)
    data = torch.cat([kp_pos, kp_feat], dim=-1).view(-1, 3 + FD)
    selected = data[neighbor_idx.view(-1)].view(-1, K, 3 + FD)
    pairs = torch.masked_select(selected, valid_mask[..., None]).view(-1, 3 + FD)
    pair_pos, pair_feat = pairs[:, :3], pairs[:, 3:]

    num_valid_pts = neighbor_idx.shape[0]
    src = torch.arange(num_valid_pts).unsqueeze(1)
    shading_idx = torch.masked_select(src, valid_mask)
    shading_pos = shading_pts[shading_idx]

    x_rel = shading_pos - pair_pos
    weights = 1.0 / (torch.norm(x_rel, dim=-1) + 1e-5)
    field_in = torch.cat([pair_feat, _pos_enc(x_rel, NFREQ)], dim=-1)
    local_feat = _mlp(state, "pointnerf.field.aggregator.local_field", 5, field_in)
    norm = torch.zeros(num_valid_pts)
    norm.index_add_(0, shading_idx, weights)
    weights = weights / norm[shading_idx]

    feat = torch.zeros(num_valid_pts, HID)
    feat.index_add_(0, shading_idx, weights[:, None] * local_feat)

    # heads (fields/mlp.py:39-71, field.py:113-141)
    sigma = F.softplus(_mlp(state, "pointnerf.field.shape_net", 2, feat) - 1)
    rgb = torch.sigmoid(_mlp(state, "pointnerf.field.channel_net", 5, feat))

    # scatter to dense (field.py:62-75)
    shape_d = torch.zeros(v, num_rays, M, 1)
    shape_d.masked_scatter_(mask, sigma)

    # shading-point depths (renderer.py:96-110)
    pts_d = torch.zeros(v, num_rays, M, 3)
    pts_d.masked_scatter_(mask.expand(-1, -1, -1, 3), shading_pts)
    sd = torch.mean((pts_d - rays_o[:, :, None, :]) / rays_d[:, :, None, :],
                    dim=-1, keepdim=True)
    sd[~mask] = -torch.inf
    sd = torch.cummax(sd, dim=-2).values
    inval = sd == -torch.inf
    sd[inval] = ray_end[..., None, :].expand(-1, -1, M, -1)[inval]

    # alpha compositing (volume_renderer.py:23-39, renderer.py:120-185)
    deltas = torch.cat([sd[..., 1:, :] - sd[..., :-1, :],
                        torch.zeros_like(sd[..., :1, :])], dim=-2)
    alpha = 1 - torch.exp(-shape_d * deltas)
    alpha_shifted = torch.cat([torch.ones_like(alpha[..., :1, :]),
                               1 - alpha + 1e-10], dim=-2)
    w = alpha * torch.cumprod(alpha_shifted, dim=-2)[..., :-1, :]
    weight_total = w.sum(-2)
    composite_depth = torch.nan_to_num(
        (w * sd).sum(-2) / weight_total, float("inf")
    ).clamp(sd.min(), sd.max())

    ray_idx = torch.arange(v * num_rays * M).view(v, num_rays, M) // M
    valid_w = w[mask]
    ch = torch.zeros(v * num_rays, 3)
    ch.index_add_(0, ray_idx[..., None][mask], valid_w[:, None] * rgb)
    ch = ch.view(v, num_rays, 3) + 1 - weight_total  # white_back

    return {
        "mask": weight_total.numpy(),
        "depth": composite_depth.numpy(),
        "channels": ch.numpy(),
    }


# --------------------------------------------------------------------------
# fixture scene + weights
# --------------------------------------------------------------------------


def _lookat_extr(eye):
    eye = torch.tensor(eye, dtype=torch.float32)
    fwd = F.normalize(-eye, dim=0)
    right = F.normalize(torch.linalg.cross(fwd, torch.tensor([0.0, 1.0, 0.0])), dim=0)
    up = torch.linalg.cross(right, fwd)
    r = torch.stack([right, -up, fwd])  # world2cam rotation
    t = -r @ eye
    extr = torch.eye(4)
    extr[:3, :3] = r
    extr[:3, 3] = t
    return extr


def _scene():
    g = torch.Generator().manual_seed(SEED)
    coords = (torch.rand(P, 3, generator=g) - 0.5) * 0.7
    feats = torch.randn(P, FD, generator=g) * 0.5
    extr = torch.stack([_lookat_extr([1.2, 0.6, 0.9]), _lookat_extr([-1.0, 0.4, -1.1])])
    intr = torch.tensor([[20.0, 0.0, 8.0], [0.0, 20.0, 8.0], [0.0, 0.0, 1.0]])
    intr = intr[None].repeat(2, 1, 1)
    return coords, feats, extr, intr


def _torch_state():
    g = torch.Generator().manual_seed(SEED + 1)

    def lin(prefix, idx, din, dout, state):
        state[f"{prefix}.{idx}.weight"] = torch.randn(dout, din, generator=g) * (
            1.0 / np.sqrt(din))
        state[f"{prefix}.{idx}.bias"] = torch.randn(dout, generator=g) * 0.1

    state = {}
    agg_in = FD + 3 * (1 + 2 * NFREQ)
    dims = [agg_in] + [HID] * 4 + [HID]
    for i in range(5):
        lin("pointnerf.field.aggregator.local_field", 2 * i, dims[i], dims[i + 1], state)
    lin("pointnerf.field.shape_net", 0, HID, HID, state)
    lin("pointnerf.field.shape_net", 2, HID, 1, state)
    cdims = [HID] * 5 + [3]
    for i in range(5):
        lin("pointnerf.field.channel_net", 2 * i, cdims[i], cdims[i + 1], state)
    coords, feats, _, _ = _scene()
    state["pointnerf.coords._extra_state"] = {
        "emb": {"weight": coords.reshape(1, -1).numpy()}
    }
    state["pointnerf.feats._extra_state"] = {
        "emb": {"weight": torch.cat([feats, feats * 0 - 3.0], -1).reshape(1, -1).numpy()}
    }
    return state


def _npcd_tpu_render(state, coords, feats, extr, intr):
    opts = pointnerf_default_options(num_points=P, feat_dim=FD)
    # knn_radius = aggregator.r * max(scaled_voxel_size) = r * 0.08
    opts = dataclasses.replace(
        opts,
        aggregator=dataclasses.replace(
            opts.aggregator, k=K, max_shading_pts=M, n_freqs=NFREQ,
            out_dim=HID, layers=(HID,) * 4, r=R_ABS / 0.08,
        ),
        field=dataclasses.replace(
            opts.field, shape_layers=(HID,), channel_layers=(HID,) * 4,
            use_dir=False,
        ),
        renderer=dataclasses.replace(
            opts.renderer, depth_resolution=DRES, cube_scale=1.0, white_back=True,
        ),
        default_resolution=RES,
    )
    assert abs(opts.knn_radius - R_ABS) < 1e-6
    pn = PointNeRF(n_obj=1, feats_dim=FD, num_points=P, opts=opts,
                   render_config=PointNeRFRenderConfig(eval_ray_chunk=RES * RES))
    params = convert_pointnerf_params(
        {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in state.items()},
        n_obj=1, num_points=P, feat_dim=FD,
    )
    out = pn.render(
        params,
        jax.numpy.asarray(coords.numpy())[None],
        jax.numpy.asarray(feats.numpy())[None],
        jax.numpy.asarray(extr.numpy())[None],
        jax.numpy.asarray(intr.numpy())[None],
        resolution=RES,
    )
    return {k: np.asarray(v)[0] for k, v in out.items()}


def test_render_matches_reference_oracle():
    coords, feats, extr, intr = _scene()
    state = _torch_state()

    with torch.no_grad():
        ref = _oracle_render(state, coords, feats, extr, intr)
    got = _npcd_tpu_render(state, coords, feats, extr, intr)

    # the scene must actually exercise the path: some rays hit, some miss
    hit = ref["mask"][..., 0] > 1e-3
    assert hit.any() and (~hit).any()
    assert hit.sum() > 20

    np.testing.assert_allclose(
        got["channels"].reshape(2, -1, 3), ref["channels"],
        rtol=1e-4, atol=2e-4, err_msg="channels",
    )
    np.testing.assert_allclose(
        got["mask"].reshape(2, -1), ref["mask"][..., 0],
        rtol=1e-4, atol=2e-4, err_msg="mask",
    )
    # depth only where the ray carries weight (void rays clamp differently
    # only through the global min/max, asserted too)
    np.testing.assert_allclose(
        got["depth"].reshape(2, -1), ref["depth"][..., 0],
        rtol=1e-3, atol=1e-3, err_msg="depth",
    )

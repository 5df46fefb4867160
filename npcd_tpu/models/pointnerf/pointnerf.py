"""PointNeRF autodecoder — TPU-native, fixed-shape, fully jittable.

Rebuild of the reference PointNeRF (npcd/models/pointnerf/pointnerf.py):
per-object coordinate + variational feature embedding tables decoded to
images by a point-based NeRF. Differences from the reference are all
TPU-first design, not behavior:

  * the CUDA voxel-grid kNN (torch_knnquery) becomes a dense dilated
    occupancy grid + MXU-matmul kNN (npcd_tpu/ops/knn.py)
  * ragged masked_select/index_add pipelines become dense masked tensors
    with a fixed `max_shading_pts` per ray
  * the reference's data-dependent valid-ray subsampling
    (aggregator.py:78-119, batch-min count) becomes a fixed-size masked
    random selection of valid rays (`train_rays`), equivalent in
    expectation
  * the whole forward (embed -> occupancy -> rays -> compaction -> kNN
    aggregation -> field -> ray march) is one traced function; the
    per-pair MLP runs in rematerialized ray chunks (lax.map +
    jax.checkpoint) to bound activation memory
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops.knn import VoxelOccupancy, within_radius, within_radius_t
from ...utils.config import PointNeRFOptions, pointnerf_default_options
from . import embeddings
from .aggregator import aggregate_features, compact_valid_samples, knn_neighbors
from .field import field_heads
from .math_utils import fill_invalid_ray_limits, get_ray_limits_box
from .nn_core import init_mlp, posenc_dim
from .ray_sampler import generate_rays
from .renderer import (
    composite_kp_weights,
    fix_shading_depths,
    ray_march,
    sample_depths,
)


@dataclasses.dataclass(frozen=True)
class PointNeRFRenderConfig:
    """Static render-time knobs (hashable -> usable as jit static arg)."""

    # fixed count of valid rays kept per view. Default 112 matches the
    # reference's effective budget: it presamples 112 rays/view and keeps
    # *all* valid ones (renderer.py:232-238, aggregator.py:78-119 caps at
    # the batch-min valid count <= 128); invalid slots here are masked out
    # of the loss instead.
    train_rays: int = 112
    train_instance_chunk: int = 50  # view-instances per remat chunk in training
    # Static per-instance shading-point budget for training. The dense
    # [train_rays, max_shading_pts] slot grid is typically only ~25% valid
    # on SRN-style scenes (measured mean 1485 / max 1699 of 5600 at the
    # reference config), so the per-pair MLP — the stage-1 flops bulk —
    # wastes ~4x on masked slots. With a budget, valid slots are packed
    # per instance (stable argsort, one-hot-matmul gathers) and the
    # kNN/aggregation/field pass runs on [budget] points only; results are
    # re-expanded before ray marching. None = dense (exact reference
    # parity). If an instance has more valid samples than the budget, the
    # deepest samples are dropped, evenly across rays (packing is ordered
    # by within-ray sample index). Choose ~25% above the expected max.
    shading_budget: Optional[int] = None
    # rematerialize the chunked field pass in training. None = auto: off
    # for bf16 compute (the fused Pallas MLP keeps intermediates in VMEM,
    # so the remaining residuals fit HBM and the chunk recompute is pure
    # waste) and ON for f32 compute, where the XLA MLP path materializes
    # every [pairs, 256] activation (~100 GB unremated at the SRN config).
    train_remat: Optional[bool] = None
    train_ray_chunk: int = 256      # kept for bwd-compat; training chunks instances
    eval_ray_chunk: int = 1024      # rays per chunk in eval
    # Slot-block size for the eval staircase (r04): rays are sorted by
    # valid-sample count (descending), so the [rays, max_shading_pts] slot
    # grid of each ray chunk is a monotone staircase — slot blocks past the
    # chunk's max count are skipped with lax.cond, making shading work track
    # the *valid sample count* (~26% slot occupancy on SRN scenes) instead
    # of the dense grid. Must divide max_shading_pts; 0/None disables
    # (dense slots, the pre-r04 behavior). A/B on v5e (32 views, SRN test
    # poses, car-box cloud, chunk=1024): sb=5 22.5 ms/view, sb=10 24.6,
    # sb=25 28.0, dense 38.1.
    eval_slot_block: Optional[int] = 5
    compute_dtype: Any = jnp.float32
    # sample-validity test: 'knn' = nearest neighbor within the absolute
    # radius (the reference's pure-tensor fallback semantic,
    # aggregator.py:42-58, one fused kNN pass); 'voxel' = dilated voxel
    # occupancy window (the CUDA voxel-grid semantic)
    validity: str = "knn"
    # Matmul precision for the render core (None = JAX ambient default).
    # On TPU the DEFAULT f32 matmul precision feeds the MXU bf16 operands,
    # so an "f32" render deviates ~2% RMS from the exact-f32 semantics
    # (measured r05: 34 dB cross-PSNR against the CPU render of the same
    # trained weights, docs/experiments/renderer_precision.json);
    # 'highest' (bf16x6 passes) restores float-exact renders for the
    # parity protocols; 'tensorfloat32' (bf16x3, emulated in-kernel by
    # ops/pallas/fused_mlp._kdot since Mosaic lowers only DEFAULT and
    # HIGHEST dots) renders 1.6x faster than 'highest' at ~2^-16 operand
    # error. The eval CLIs and tools/parity_eval.py set 'highest';
    # training keeps the ambient default (bf16 compute is the qualified
    # training configuration anyway).
    matmul_precision: Optional[str] = None

    def resolved_train_remat(self) -> bool:
        if self.train_remat is not None:
            return self.train_remat
        return self.compute_dtype != jnp.bfloat16


class PointNeRF:
    def __init__(
        self,
        n_obj: int,
        feats_dim: int = 32,
        num_points: int = 512,
        use_view_dir: bool = False,
        opts: Optional[PointNeRFOptions] = None,
        render_config: Optional[PointNeRFRenderConfig] = None,
    ):
        self.n_obj = n_obj
        self.opts = opts or pointnerf_default_options(
            num_points=num_points, feat_dim=feats_dim, use_view_dir=use_view_dir
        )
        self.cfg = render_config or PointNeRFRenderConfig()

    # -- params --------------------------------------------------------------

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        o = self.opts
        agg_in = o.feat_dim + posenc_dim(3, o.aggregator.n_freqs)
        shape_in = o.aggregator.out_dim
        channel_in = o.aggregator.out_dim
        if o.field.use_dir:
            channel_in += posenc_dim(3, o.field.dir_freqs) if o.field.dir_freqs > 0 else 3
        k1, k2, k3 = jax.random.split(rng, 3)
        return {
            "coords_table": embeddings.init_coords_table(self.n_obj, o.num_points),
            "feats_table": embeddings.init_variational_feats_table(
                self.n_obj, o.num_points, o.feat_dim
            ),
            "aggregator": {
                "local_field": init_mlp(
                    k1, o.aggregator.layers, agg_in, o.aggregator.out_dim
                )
            },
            "field": {
                "shape_net": init_mlp(k2, o.field.shape_layers, shape_in, 1),
                "channel_net": init_mlp(k3, o.field.channel_layers, channel_in, 3),
            },
        }

    def set_all_coords(self, params: Dict[str, Any], coords) -> Dict[str, Any]:
        """Seed the (frozen) coords table from dataset FPS point clouds
        (reference pointnerf.py:35-40)."""
        coords = jnp.asarray(coords, jnp.float32).reshape(
            self.n_obj, self.opts.num_points, 3
        )
        return {**params, "coords_table": coords}

    def get_all_coords(self, params) -> jnp.ndarray:
        return params["coords_table"]

    def get_all_feats(self, params) -> jnp.ndarray:
        """Mean half of the variational table (reference pointnerf.py:46-54)."""
        return params["feats_table"][..., : self.opts.feat_dim]

    # -- core ----------------------------------------------------------------

    def _render_core(
        self,
        params: Dict[str, Any],
        kp_pos: jnp.ndarray,     # [I, P, 3]
        kp_feat: jnp.ndarray,    # [I, P, F]
        occ: Optional[VoxelOccupancy],  # grids [I, ...] ('voxel' validity only)
        rays_o: jnp.ndarray,     # [I, R, 3]
        rays_d: jnp.ndarray,     # [I, R, 3]
        rng: Optional[jax.Array],
        train: bool,
        max_shading_pts: int,
        ray_chunk: int,
        select_rays: Optional[int] = None,
        kp_weights: bool = False,
        draws: Optional[Dict[str, jnp.ndarray]] = None,
    ) -> Dict[str, jnp.ndarray]:
        if self.cfg.matmul_precision is not None:
            # applies at trace time, so it covers everything this method
            # stages out (kNN, aggregation MLPs, field heads, ray march)
            with jax.default_matmul_precision(self.cfg.matmul_precision):
                return self._render_core_body(
                    params, kp_pos, kp_feat, occ, rays_o, rays_d, rng,
                    train, max_shading_pts, ray_chunk, select_rays,
                    kp_weights, draws,
                )
        return self._render_core_body(
            params, kp_pos, kp_feat, occ, rays_o, rays_d, rng, train,
            max_shading_pts, ray_chunk, select_rays, kp_weights, draws,
        )

    def _render_core_body(
        self,
        params: Dict[str, Any],
        kp_pos: jnp.ndarray,     # [I, P, 3]
        kp_feat: jnp.ndarray,    # [I, P, F]
        occ: Optional[VoxelOccupancy],  # grids [I, ...] ('voxel' validity only)
        rays_o: jnp.ndarray,     # [I, R, 3]
        rays_d: jnp.ndarray,     # [I, R, 3]
        rng: Optional[jax.Array],
        train: bool,
        max_shading_pts: int,
        ray_chunk: int,
        select_rays: Optional[int] = None,
        kp_weights: bool = False,
        draws: Optional[Dict[str, jnp.ndarray]] = None,
    ) -> Dict[str, jnp.ndarray]:
        o = self.opts
        i_dim, r_dim = rays_o.shape[:2]
        m = max_shading_pts
        if kp_weights and train:
            raise ValueError("kp_weights compositing is an eval-only diagnostic")

        ray_start, ray_end = get_ray_limits_box(rays_o, rays_d, o.renderer.cube_scale)
        ray_start, ray_end = fill_invalid_ray_limits(ray_start, ray_end)
        ray_start, ray_end = ray_start[..., 0], ray_end[..., 0]  # [I, R]

        rng_jitter = rng_select = None
        if rng is not None:
            rng_jitter, rng_select = jax.random.split(rng)

        depths = sample_depths(
            ray_start, ray_end, o.renderer.depth_resolution,
            rng_jitter if train else None,
            disparity=o.renderer.disparity_space_sampling,
            jitter=draws.get("depth_jitter") if draws else None,
        )  # [I, R, S]

        if self.cfg.validity == "voxel":
            x = rays_o[:, :, None, :] + depths[..., None] * rays_d[:, :, None, :]
            valid = occ.query(x.reshape(i_dim, -1, 3)).reshape(depths.shape)
        else:
            # nearest-neighbor-in-radius validity via the transposed
            # min-distance kernel: cheaper than the occupancy
            # scatter+gather on TPU and exactly the reference fallback's
            # semantic. Samples are assembled directly in the kernel's
            # [I, 3, R*S] coords-on-sublanes layout — a [I, R*S, 3] array's
            # 3-lane minor dim tiles to 128 lanes in HBM (~16x physical),
            # which cost 9 ms pad + 8.9 ms producer per step in the r03
            # trace.
            xt = (jnp.swapaxes(rays_o, 1, 2)[:, :, :, None]
                  + depths[:, None, :, :]
                  * jnp.swapaxes(rays_d, 1, 2)[:, :, :, None]
                  )  # [I, 3, R, S]
            valid = within_radius_t(
                xt.reshape(i_dim, 3, -1), jax.lax.stop_gradient(kp_pos),
                o.knn_radius,
            ).reshape(depths.shape)
        depths_c, pts_mask = compact_valid_samples(valid, depths, m)  # [I, R, M]

        if draws is not None and "ray_mask" in draws:
            # matched-draw injection (tools/ref_dynamics.py): restrict the
            # trainable ray set to an externally chosen subset — rays
            # outside it become 'invalid' (excluded from shading and from
            # the masked recon mean), emulating the reference's
            # subsample_valid_rays selection with its exact draws.
            pts_mask = jnp.logical_and(pts_mask, draws["ray_mask"][..., None])

        sel_idx = None
        if select_rays is not None:
            ray_valid = jnp.any(pts_mask, axis=-1)  # [I, R]
            score = jax.random.uniform(rng_select, (i_dim, r_dim))
            score = jnp.where(ray_valid, score, -1.0)
            _, sel_idx = jax.lax.top_k(score, select_rays)  # [I, R_sel]
            take = lambda a: jnp.take_along_axis(
                a, sel_idx.reshape(i_dim, select_rays, *([1] * (a.ndim - 2))), axis=1
            )
            depths_c, pts_mask = take(depths_c), take(pts_mask)
            rays_o, rays_d = take(rays_o), take(rays_d)
            ray_end = jnp.take_along_axis(ray_end, sel_idx, axis=1)
            r_dim = select_rays

        ray_valid = jnp.any(pts_mask, axis=-1)  # [I, R] (original ray order)

        # ---- eval-time valid-ray packing ----------------------------------
        # Sort rays by valid-sample count, descending, so (a) valid rays
        # pack into the leading chunks — chunks with no valid ray are
        # skipped with real control flow (lax.cond inside the sequential
        # chunk map) — and (b) within the live chunks the [rays, M] slot
        # grid is a monotone staircase, so trailing slot blocks die for all
        # but the first chunks (see field_chunk). On SRN-style scenes most
        # rays miss the object and valid rays occupy ~26% of their slots,
        # so this cuts eval render work to ~the valid-sample count.
        inv_order = None
        if not train:
            counts = jnp.sum(pts_mask, axis=-1).astype(jnp.int32)  # [I, R]
            order = jnp.argsort(-counts, axis=1, stable=True)  # [I, R]
            take_ord = lambda a: jnp.take_along_axis(
                a, order.reshape(i_dim, r_dim, *([1] * (a.ndim - 2))), axis=1
            )
            depths_c, pts_mask = take_ord(depths_c), take_ord(pts_mask)
            rays_o, rays_d = take_ord(rays_o), take_ord(rays_d)
            ray_end = jnp.take_along_axis(ray_end, order, axis=1)
            inv_order = jnp.argsort(order, axis=1)

        # ---- chunked field pass -------------------------------------------
        # The expensive part (kNN + per-pair MLP + heads + march) runs in
        # bounded-memory chunks under lax.map. The chunk axis depends on the
        # workload shape: eval has few instances and many rays (chunk rays);
        # training has many instances (B*V) and few selected rays (chunk
        # instances, rematerialized for the backward pass).
        def field_chunk(d_c, msk, r_o, r_d, r_e, kpp, kpf, neighbors=None):
            n_i, n_r = d_c.shape[:2]
            ray_dir = r_d if o.field.use_dir else None

            def shade(d_b, m_b):
                n_s = d_b.shape[-1]
                pts = r_o[:, :, None, :] + d_b[..., None] * r_d[:, :, None, :]
                agg = aggregate_features(
                    params["aggregator"], o.aggregator, o.knn_radius,
                    pts.reshape(n_i, -1, 3), m_b.reshape(n_i, -1),
                    kpp, kpf, compute_dtype=self.cfg.compute_dtype,
                    neighbors=neighbors, return_weights=kp_weights,
                )
                feat = agg[0].reshape(n_i, n_r, n_s, -1)
                valid_pt = agg[1].reshape(n_i, n_r, n_s)
                sigma, rgb = field_heads(
                    params["field"], o.field, feat, valid_pt, ray_dir,
                    compute_dtype=self.cfg.compute_dtype,
                )
                return sigma, rgb, valid_pt, agg

            # ---- slot-block staircase (eval, r04) -----------------------
            # Rays arrive count-sorted (descending), so the [n_r, M] slot
            # grid is a monotone staircase: block b is all-invalid for most
            # chunks past the first. Shading each M//sb block under lax.cond
            # makes the kNN + aggregation MLP + head work proportional to
            # the number of *valid samples* (~26% slot occupancy on SRN
            # scenes) instead of the dense grid.
            sb = self.cfg.eval_slot_block or 0
            use_blocks = (
                not train and not kp_weights and neighbors is None
                and 0 < sb < m and m % sb == 0
            )
            agg = None
            if use_blocks:
                n_blk = m // sb
                blk = lambda a: jnp.moveaxis(
                    a.reshape(n_i, n_r, n_blk, sb), 2, 0)  # [NB, I, r, sb]

                def block_body(xs):
                    d_b, m_b = xs

                    def live(_):
                        s, c, v, _ = shade(d_b, m_b)
                        return s, c, v

                    def dead(_):
                        return (
                            jnp.zeros((n_i, n_r, sb), jnp.float32),
                            jnp.zeros((n_i, n_r, sb, 3), jnp.float32),
                            jnp.zeros((n_i, n_r, sb), bool),
                        )

                    return jax.lax.cond(jnp.any(m_b), live, dead, None)

                s_b, c_b, v_b = jax.lax.map(block_body, (blk(d_c), blk(msk)))
                unblk = lambda a: jnp.moveaxis(a, 0, 2).reshape(
                    n_i, n_r, m, *a.shape[4:])
                sigma, rgb, valid_pt = unblk(s_b), unblk(c_b), unblk(v_b)
            else:
                sigma, rgb, valid_pt, agg = shade(d_c, msk)

            d_fixed = fix_shading_depths(d_c, valid_pt, r_e)
            out = ray_march(sigma, d_fixed, rgb, o.renderer.white_back,
                            return_weights=kp_weights)
            if kp_weights:
                # per-keypoint attribution (reference field.py:148-149 +
                # renderer.py:177-184); kNN pairs reshaped to per-ray [M, K]
                agg_w = agg[2].reshape(n_i, n_r, m, -1)
                nb_idx = agg[3].reshape(n_i, n_r, m, -1)
                out["kp_weights"] = composite_kp_weights(
                    out.pop("sample_weights"), agg_w, nb_idx, kpp.shape[1]
                )
            return out

        if train:
            cap = self.cfg.shading_budget
            if cap is not None and cap < r_dim * m:
                # ---- per-instance shading-point compaction --------------
                # Pack the valid (ray, sample) slots of each instance to the
                # front and run kNN + aggregation + field heads on a fixed
                # [cap] budget instead of the ~25%-occupied dense [R*M]
                # grid; expand (one-hot-matmul gather through the slot
                # ranks) before ray marching. Gradients flow through the
                # same gathers (gather_rows has a matmul custom_vjp).
                from .aggregator import gather_rows, pack_rows

                flat_mask = pts_mask.reshape(i_dim, r_dim * m)
                # pack valid slots first, ordered by within-ray sample index
                # (all first samples of every ray, then all second samples,
                # ...): on overflow the *deepest* samples are dropped, evenly
                # across rays — a plain ray-major stable sort would instead
                # silently zero out entire trailing rays. The packed order is
                # irrelevant downstream (the rank gather restores slot
                # positions before ray marching).
                #
                # The sample-major key takes only m+1 distinct values, so the
                # packed position of every slot is a COUNTING sort — three
                # cumsums — not a comparison sort (the two stable argsorts
                # over [I, R*M] keys this replaces measured ~4 ms/step):
                #   valid (r, j):  #valid with sample < j  (offset_j)
                #                + #valid rays before r at sample j (prefix_r)
                #   invalid:       n_valid + #invalid before it in flat order
                mask_i = pts_mask.astype(jnp.int32)  # [I, R, m]
                cnt_j = jnp.sum(mask_i, axis=1)  # [I, m]
                offset_j = jnp.cumsum(cnt_j, axis=1) - cnt_j  # exclusive
                prefix_r = jnp.cumsum(mask_i, axis=1) - mask_i  # [I, R, m]
                n_valid = jnp.sum(cnt_j, axis=1)  # [I]
                inv_i = 1 - mask_i.reshape(i_dim, r_dim * m)
                inv_prefix = jnp.cumsum(inv_i, axis=1) - inv_i
                rank = jnp.where(
                    flat_mask,
                    (offset_j[:, None, :] + prefix_r).reshape(i_dim, -1),
                    n_valid[:, None] + inv_prefix,
                )  # [I, R*M] slot -> packed pos
                c_mask = jnp.arange(cap)[None, :] < jnp.minimum(n_valid, cap)[:, None]
                # one fused gather of dense sample points (+ ray dirs when
                # the field is view-dependent): three separate one-hot
                # gathers (depth, rays_o, rays_d) measured ~16 ms/step —
                # each [cap, R*M] x [R*M, C] dot has a tiny C, so batching
                # the columns amortizes the one-hot contraction
                pts_all = (rays_o[:, :, None, :]
                           + depths_c[..., None] * rays_d[:, :, None, :]
                           ).reshape(i_dim, r_dim * m, 3)
                if o.field.use_dir:
                    table = jnp.concatenate(
                        [pts_all,
                         jnp.broadcast_to(rays_d[:, :, None, :],
                                          (i_dim, r_dim, m, 3)
                                          ).reshape(i_dim, r_dim * m, 3)],
                        axis=-1,
                    )  # [I, R*M, 6]
                    packed_in = pack_rows(table, rank, cap)  # [I, cap, 6]
                    c_pts = packed_in[..., :3]
                    c_rayd = packed_in[..., 3:6]
                else:
                    c_pts = pack_rows(pts_all, rank, cap)  # [I, cap, 3]
                    c_rayd = jnp.zeros_like(c_pts)
                nb_idx, nb_mask = knn_neighbors(
                    c_pts, c_mask, kp_pos, o.aggregator.k, o.knn_radius
                )

                def budget_chunk(c_pt, c_msk, c_rd, rnk, d_c, r_e,
                                 kpp, kpf, nbi, nbm):
                    feat, valid_c = aggregate_features(
                        params["aggregator"], o.aggregator, o.knn_radius,
                        c_pt, c_msk, kpp, kpf,
                        compute_dtype=self.cfg.compute_dtype,
                        neighbors=(nbi, nbm),
                    )  # [ic, cap, C], [ic, cap]
                    ray_dir = c_rd if o.field.use_dir else None
                    sigma, rgb = field_heads(
                        params["field"], o.field, feat, valid_c, ray_dir,
                        compute_dtype=self.cfg.compute_dtype,
                    )  # [ic, cap], [ic, cap, 3]
                    packed = jnp.concatenate(
                        [sigma[..., None], rgb,
                         valid_c[..., None].astype(rgb.dtype)], axis=-1,
                    )  # [ic, cap, 5]
                    full = gather_rows(packed, jnp.minimum(rnk, cap - 1))
                    full = jnp.where((rnk < cap)[..., None], full, 0.0)
                    n_i = full.shape[0]
                    sigma_f = full[..., 0].reshape(n_i, r_dim, m)
                    rgb_f = full[..., 1:4].reshape(n_i, r_dim, m, 3)
                    valid_f = (full[..., 4] > 0.5).reshape(n_i, r_dim, m)
                    d_fixed = fix_shading_depths(d_c, valid_f, r_e)
                    return ray_march(sigma_f, d_fixed, rgb_f, o.renderer.white_back)

                chunk_arrays = (c_pts, c_mask, c_rayd, rank, depths_c,
                                ray_end, kp_pos, kp_feat, nb_idx, nb_mask)
                body_fn = lambda c: budget_chunk(*c)
            else:
                # kNN once for all instances, outside the rematerialized
                # chunks: the (idx, mask) outputs are small s32/bool tensors,
                # so saving them beats re-running the kNN kernel in the
                # backward pass.
                pts_all = rays_o[:, :, None, :] + depths_c[..., None] * rays_d[:, :, None, :]
                nb_idx, nb_mask = knn_neighbors(
                    pts_all.reshape(i_dim, -1, 3), pts_mask.reshape(i_dim, -1),
                    kp_pos, o.aggregator.k, o.knn_radius,
                )
                chunk_arrays = (depths_c, pts_mask, rays_o, rays_d, ray_end,
                                kp_pos, kp_feat, nb_idx, nb_mask)
                body_fn = lambda c: field_chunk(*c[:7], neighbors=(c[7], c[8]))

            ic = min(self.cfg.train_instance_chunk, i_dim)
            pad_i = (-i_dim) % ic
            padi = lambda a: jnp.concatenate(
                [a, jnp.zeros((pad_i,) + a.shape[1:], a.dtype)], axis=0
            ) if pad_i else a
            arrays = tuple(padi(a) for a in chunk_arrays)
            n_chunks = (i_dim + pad_i) // ic
            xs = tuple(a.reshape(n_chunks, ic, *a.shape[1:]) for a in arrays)

            if self.cfg.resolved_train_remat():
                body_fn = jax.checkpoint(body_fn)
            outs = jax.lax.map(body_fn, xs)  # dict of [C, ic, R, ...]
            out = {
                k: v.reshape(n_chunks * ic, *v.shape[2:])[:i_dim]
                for k, v in outs.items()
            }
        else:
            num_rays = r_dim
            pad = (-num_rays) % ray_chunk
            if pad:
                padf = lambda a: jnp.concatenate(
                    [a, jnp.zeros((i_dim, pad) + a.shape[2:], a.dtype)], axis=1
                )
                depths_c, rays_o, rays_d, ray_end = map(
                    padf, (depths_c, rays_o, rays_d, ray_end)
                )
                pts_mask = jnp.concatenate(
                    [pts_mask, jnp.zeros((i_dim, pad, m), bool)], axis=1
                )
            n_chunks = (num_rays + pad) // ray_chunk

            def to_chunks(a):
                return jnp.moveaxis(
                    a.reshape(i_dim, n_chunks, ray_chunk, *a.shape[2:]), 1, 0
                )

            xs = tuple(map(to_chunks, (depths_c, pts_mask, rays_o, rays_d, ray_end)))

            def body_fn(chunk):
                d_c, msk, r_o, r_d, r_e = chunk

                def dead(_):
                    bg = 1.0 if o.renderer.white_back else 0.0
                    out = {
                        "mask": jnp.zeros((i_dim, ray_chunk), jnp.float32),
                        # matches ray_march on an all-invalid chunk: composite
                        # is nan -> inf -> clipped to the chunk's max depth
                        "depth": jnp.full((i_dim, ray_chunk), jnp.max(r_e)),
                        "channels": jnp.full((i_dim, ray_chunk, 3), bg, jnp.float32),
                    }
                    if kp_weights:
                        out["kp_weights"] = jnp.zeros(
                            (i_dim, ray_chunk, kp_pos.shape[1]), jnp.float32
                        )
                    return out

                return jax.lax.cond(
                    jnp.any(msk),
                    lambda _: field_chunk(d_c, msk, r_o, r_d, r_e, kp_pos, kp_feat),
                    dead,
                    None,
                )

            outs = jax.lax.map(body_fn, xs)  # dict of [C, I, ck, ...]

            def from_chunks(a):
                a = jnp.moveaxis(a, 0, 1).reshape(
                    i_dim, n_chunks * ray_chunk, *a.shape[3:]
                )
                a = a[:, :num_rays]
                if inv_order is not None:
                    a = jnp.take_along_axis(
                        a,
                        inv_order.reshape(i_dim, num_rays, *([1] * (a.ndim - 2))),
                        axis=1,
                    )
                return a

            out = {k: from_chunks(v) for k, v in outs.items()}

        out["ray_valid"] = ray_valid
        if sel_idx is not None:
            out["sel_idx"] = sel_idx
        return out

    # -- public APIs -----------------------------------------------------------

    def forward(
        self,
        params: Dict[str, Any],
        obj_idx: jnp.ndarray,      # [B]
        intrinsics: jnp.ndarray,   # [B, V, 3, 3]
        extrinsics: jnp.ndarray,   # [B, V, 4, 4]
        rng: Optional[jax.Array] = None,
        train: bool = False,
        resolution: Optional[int] = None,
        draws: Optional[Dict[str, jnp.ndarray]] = None,
    ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        """Autodecoder forward (reference pointnerf.py:56-105).

        train=True: variational feats sampling, ray presample/selection,
        depth jitter (requires rng). Returns (pred, aux); pred tensors are
        [B, V, R, ...] with R = cfg.train_rays (train) or res^2 (eval);
        pred['ray_idx'] gives the flat pixel index of each ray.

        `draws` (matched-draw parity experiments, tools/ref_dynamics.py)
        overrides individual random draws with explicit tensors recorded
        from the reference trainer: 'feats_eps' [B, P, F] variational
        noise, 'pixel_idx' [R_pre] shared presampled pixels,
        'depth_jitter' [B*V, R_pre, S] in [0,1), 'ray_mask' [B*V, R_pre]
        selected-ray subset.
        """
        o = self.opts
        res = resolution or o.default_resolution
        b, v = extrinsics.shape[:2]

        rng_feat = rng_perm = rng_core = None
        if train:
            assert rng is not None, "training forward requires rng"
            rng_feat, rng_perm, rng_core = jax.random.split(rng, 3)

        coords = embeddings.lookup_coords(params["coords_table"], obj_idx)
        feats = embeddings.sample_feats(
            params["feats_table"], obj_idx, rng_feat,
            eps=draws.get("feats_eps") if draws else None,
        )
        f_mean, f_log_var, f_std = embeddings.feats_mean_log_var_std(
            params["feats_table"], obj_idx
        )
        aux = {
            "coords": coords,
            "feats": f_mean,
            "feats_mean": f_mean,
            "feats_log_var": f_log_var,
            "feats_std": f_std,
        }

        i_dim = b * v
        ray_idx = None
        pixel_idx = None
        if train and o.renderer.ray_subsamples:
            # One shared random pixel subset across all instances
            # (reference renderer.py:232-238); only those rays are generated.
            if draws is not None and "pixel_idx" in draws:
                pixel_idx = draws["pixel_idx"]
            else:
                pixel_idx = jax.random.permutation(rng_perm, res * res)[
                    : o.renderer.ray_subsamples
                ]
            ray_idx = pixel_idx  # [R_pre]
        rays_o, rays_d = generate_rays(
            extrinsics.reshape(i_dim, 4, 4), intrinsics.reshape(i_dim, 3, 3),
            res, pixel_idx=pixel_idx,
        )  # [I, R, 3]

        rep = lambda a: jnp.repeat(a, v, axis=0)
        occ_i = None
        if self.cfg.validity == "voxel":
            occ_b = VoxelOccupancy.build(coords, o.voxel_grid)
            occ_i = VoxelOccupancy(
                grid=rep(occ_b.grid), origin=occ_b.origin,
                voxel_size=occ_b.voxel_size, dims=occ_b.dims,
            )

        out = self._render_core(
            params,
            rep(coords),
            rep(feats),
            occ_i,
            rays_o,
            rays_d,
            rng_core,
            train=train,
            max_shading_pts=o.aggregator.max_shading_pts,
            ray_chunk=self.cfg.train_ray_chunk if train else self.cfg.eval_ray_chunk,
            select_rays=self.cfg.train_rays if train else None,
            draws=draws,
        )

        reshape = lambda a: a.reshape(b, v, *a.shape[1:])
        pred = {
            "mask": reshape(out["mask"])[..., None],
            "depth": reshape(out["depth"])[..., None],
            "channels": reshape(out["channels"]),
            "ray_valid": reshape(out["ray_valid"]),
        }
        if "sel_idx" in out:
            pred["ray_idx"] = reshape(ray_idx[out["sel_idx"]])
            # position of each selected ray within the presampled pixel
            # set — lets the loss gather GT from host-presampled images
            # ([B, V, R_pre, 3]) instead of full frames (the H2D saver,
            # train/pointnerf_training.py host_pixel_presample)
            pred["ray_sel"] = reshape(out["sel_idx"])
        elif ray_idx is not None:
            pred["ray_idx"] = jnp.broadcast_to(ray_idx, (b, v, ray_idx.shape[0]))
        return pred, aux

    def render(
        self,
        params: Dict[str, Any],
        coords: jnp.ndarray,       # [B, P, 3]
        feats: jnp.ndarray,        # [B, P, F]
        extrinsics: jnp.ndarray,   # [B, V, 4, 4]
        intrinsics: jnp.ndarray,   # [B, V, 3, 3]
        resolution: int = 128,
        max_shading_points: Optional[int] = None,
        kp_weights: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Generation-time render of explicit point clouds
        (reference pointnerf.py:107-131).

        kp_weights=True additionally composites per-keypoint aggregation
        weights along each ray (point-attribution diagnostic, reference
        field.py:148-149 / renderer.py:177-184): output gains 'kp_weights'
        [B, V, R, P]."""
        o = self.opts
        b, v = extrinsics.shape[:2]
        i_dim = b * v

        rays_o, rays_d = generate_rays(
            extrinsics.reshape(i_dim, 4, 4),
            intrinsics.reshape(i_dim, 3, 3),
            resolution,
        )
        rep = lambda a: jnp.repeat(a, v, axis=0)
        occ_i = None
        if self.cfg.validity == "voxel":
            occ_b = VoxelOccupancy.build(coords, o.voxel_grid)
            occ_i = VoxelOccupancy(
                grid=rep(occ_b.grid), origin=occ_b.origin,
                voxel_size=occ_b.voxel_size, dims=occ_b.dims,
            )
        out = self._render_core(
            params, rep(coords), rep(feats), occ_i, rays_o, rays_d,
            rng=None, train=False,
            max_shading_pts=max_shading_points or o.aggregator.max_shading_pts,
            ray_chunk=self.cfg.eval_ray_chunk,
            kp_weights=kp_weights,
        )
        reshape = lambda a: a.reshape(b, v, *a.shape[1:])
        res_out = {
            "mask": reshape(out["mask"])[..., None],
            "depth": reshape(out["depth"])[..., None],
            "channels": reshape(out["channels"]),
            "ray_valid": reshape(out["ray_valid"]),
        }
        if kp_weights:
            res_out["kp_weights"] = reshape(out["kp_weights"])
        return res_out

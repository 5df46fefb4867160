"""Single-pass fused AdamW + EMA parameter update.

Profiling the stage-2 step on v5e showed optax's tree_map pipeline
(scale_by_adam -> add_decayed_weights -> scale_by_lr -> apply_updates,
then one more full lerp pass per EMA model, then a separate
optax.global_norm over the grads) costing ~64 ms/step on the 302M-param
denoiser — ~23% of the step, running far below HBM bandwidth because the
parameter/moment/EMA arrays are streamed through HBM several times.

This module computes the identical math as ONE closure per parameter
leaf: XLA emits a single fusion per leaf that reads (grad, param, mu,
nu, ema...) once and writes (param, mu, nu, ema...) once — the minimal
HBM traffic for the update (~10.8 GB vs ~25+ GB before).  The global
grad-norm (needed for the metric, and for optional clipping) is computed
in the same function so the grads are not re-read afterwards.

Numerics mirror optax.chain([clip_by_global_norm,] adamw(...)) followed
by utils.ema.ema_update exactly (same op order, incl. safe_increment and
bias-correction placement); tests/test_fused_update.py asserts multi-step
equivalence against the optax reference path.  The optimizer state keeps
optax's exact pytree structure (ScaleByAdamState inside the chain tuple)
so checkpoints are interchangeable between the fused and optax paths.

Reference counterpart: npcd/train/diffusion_training.py:115-116 (AdamW)
+ npcd/utils/ema.py:113-138 (per-step Python-level lerp over all params).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ..utils.ema import EmaConfig, ema_decay


def _is_adam(s) -> bool:
    return isinstance(s, optax.ScaleByAdamState)


def _get_adam_state(opt_state) -> optax.ScaleByAdamState:
    states = [
        s
        for s in jax.tree_util.tree_leaves(opt_state, is_leaf=_is_adam)
        if _is_adam(s)
    ]
    if len(states) != 1:
        raise ValueError(
            f"expected exactly one ScaleByAdamState in opt_state, got {len(states)}"
        )
    return states[0]


def _replace_adam_state(opt_state, new_state: optax.ScaleByAdamState):
    return jax.tree_util.tree_map(
        lambda s: new_state if _is_adam(s) else s, opt_state, is_leaf=_is_adam
    )


@dataclasses.dataclass(frozen=True)
class FusedAdamWEma:
    """AdamW (+ optional global-norm clip) + N EMA copies, fused per-leaf."""

    learning_rate: float
    weight_decay: float
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    clip_max_norm: Optional[float] = None
    ema_cfgs: Tuple[EmaConfig, ...] = ()

    def make_tx(self) -> optax.GradientTransformation:
        """The equivalent optax chain — used for init (state-structure
        parity with checkpoints written by the optax path) and as the
        reference implementation in tests."""
        chain = []
        if self.clip_max_norm:
            chain.append(optax.clip_by_global_norm(self.clip_max_norm))
        chain.append(
            optax.adamw(
                self.learning_rate, b1=self.b1, b2=self.b2, eps=self.eps,
                weight_decay=self.weight_decay,
            )
        )
        return optax.chain(*chain)

    def update(
        self,
        grads: Any,
        opt_state: Any,
        params: Any,
        ema_params: Sequence[Any],
        step: jnp.ndarray,
        clip_scale: Optional[jnp.ndarray] = None,
        grad_norm: Optional[jnp.ndarray] = None,
        pallas: Optional[bool] = None,
    ):
        """Returns (params, opt_state, ema_params, grad_norm).

        `step` is the EMA update count (the train-state step counter);
        Adam's bias-correction count lives in opt_state.  Pass
        `clip_scale`/`grad_norm` to override the internally computed
        global norm (the TP step computes a mesh-correct norm itself).
        `pallas` selects the streaming one-pass kernel for the large 2-D
        leaves (ops/pallas/fused_adamw.py); default: on for TPU backends.
        """
        import jax.tree_util as jtu

        adam = _get_adam_state(opt_state)
        if pallas is None:
            pallas = jax.default_backend() == "tpu"
        need_norm_prepass = grad_norm is None and (
            bool(self.clip_max_norm) or not pallas
        )
        if need_norm_prepass:
            grad_norm = optax.global_norm(grads)
        if self.clip_max_norm and clip_scale is None:
            # optax.clip_by_global_norm: g * (max_norm / norm) when above
            clip_scale = jnp.where(
                grad_norm < self.clip_max_norm,
                jnp.ones((), jnp.float32),
                self.clip_max_norm / grad_norm,
            )

        count_inc = optax.safe_increment(adam.count)
        bc1 = 1.0 - self.b1 ** count_inc.astype(jnp.float32)
        bc2 = 1.0 - self.b2 ** count_inc.astype(jnp.float32)
        decays = tuple(ema_decay(cfg, step) for cfg in self.ema_cfgs)
        n_ema = len(decays)

        if pallas:
            from ..ops.pallas.fused_adamw import adamw_ema_leaf, leaf_eligible

            scalars = jnp.stack(
                [bc1, bc2,
                 (clip_scale if clip_scale is not None
                  else jnp.ones((), jnp.float32))]
                + [d.astype(jnp.float32) for d in decays]
            )
            sumsqs = []

        def leaf(g, p, mu, nu, *emas):
            if pallas and leaf_eligible(p):
                p2, mu2, nu2, emas2, sumsq = adamw_ema_leaf(
                    scalars, g, p, mu, nu, emas,
                    b1=self.b1, b2=self.b2, eps=self.eps,
                    lr=self.learning_rate, wd=self.weight_decay,
                    use_clip=clip_scale is not None,
                )
                sumsqs.append(sumsq)
                return (p2, mu2, nu2) + emas2
            if pallas:
                sumsqs.append(jnp.sum(jnp.square(g)))
            if clip_scale is not None:
                g = g * clip_scale
            # optax.update_moment / update_moment_per_elem_norm op order
            mu2 = (1.0 - self.b1) * g + self.b1 * mu
            nu2 = (1.0 - self.b2) * (g * g) + self.b2 * nu
            upd = (mu2 / bc1) / (jnp.sqrt(nu2 / bc2) + self.eps)
            upd = upd + self.weight_decay * p
            p2 = p + (-self.learning_rate) * upd
            emas2 = tuple(
                e * d + p2.astype(e.dtype) * (1.0 - d)
                for e, d in zip(emas, decays)
            )
            return (p2, mu2, nu2) + emas2

        out = jtu.tree_map(leaf, grads, params, adam.mu, adam.nu, *ema_params)
        outer = jtu.tree_structure(params)
        inner = jtu.tree_structure((0,) * (3 + n_ema))
        parts = jtu.tree_transpose(outer, inner, out)
        new_params, new_mu, new_nu = parts[0], parts[1], parts[2]
        new_emas = tuple(parts[3:])

        if grad_norm is None:  # pallas path, no clip: free pre-clip norm
            grad_norm = jnp.sqrt(sum(sumsqs))

        new_opt_state = _replace_adam_state(
            opt_state,
            optax.ScaleByAdamState(count=count_inc, mu=new_mu, nu=new_nu),
        )
        return new_params, new_opt_state, new_emas, grad_norm

"""Small shared helpers (cf. reference npcd/utils/util.py)."""
from __future__ import annotations

import random
from typing import Any, Iterable, Iterator, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def chunks(lst: Sequence[Any], n: int) -> Iterator[Sequence[Any]]:
    """Yield successive n-sized chunks from lst (reference util.py:13-16)."""
    for i in range(0, len(lst), n):
        yield lst[i:i + n]


def split_num(num: int, max_size: int) -> List[int]:
    """Split `num` into parts each at most `max_size`
    (reference util.py:19-27)."""
    if num <= 0:
        return []
    out = [max_size] * (num // max_size)
    if num % max_size:
        out.append(num % max_size)
    return out


def set_seed(seed: int) -> None:
    """Seed python/numpy RNGs (JAX RNG is explicit via PRNG keys)."""
    random.seed(seed)
    np.random.seed(seed)


def to_numpy(tree: Any) -> Any:
    """Recursively convert jax arrays in a pytree to numpy."""
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def backend_initializes(timeout_s: float = 300.0) -> bool:
    """True if JAX backend init succeeds in a fresh subprocess within
    ``timeout_s``.

    Probing in-process is unbounded: a registered-but-unreachable device
    plugin (e.g. this image's tunneled TPU) can make ``jax.devices()`` hang
    indefinitely rather than raise, and an initialized-then-failed backend
    cannot be retried in-process. A subprocess probe is killable and leaves
    this process free to force ``jax_platforms='cpu'`` afterwards. Call
    BEFORE anything triggers backend init in this process."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def count_parameters(params: Any) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def psnr(pred: np.ndarray, gt: np.ndarray, data_range: float = 1.0) -> float:
    """Peak signal-to-noise ratio, matching skimage.metrics.peak_signal_noise_ratio
    as used by the reference eval (npcd/eval/pointnerf_evaluation.py:254)."""
    pred = np.asarray(pred, dtype=np.float64)
    gt = np.asarray(gt, dtype=np.float64)
    mse = np.mean((pred - gt) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10((data_range ** 2) / mse))


def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over all non-batch dimensions (reference util.py:83-86)."""
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL divergence between two diagonal gaussians (reference util.py:37-52)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * x ** 3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a gaussian discretized to 255 bins
    (reference util.py:55-80; standard DDPM decoder NLL)."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    log_probs = jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(
            x > 0.999,
            log_one_minus_cdf_min,
            jnp.log(jnp.clip(cdf_delta, min=1e-12)),
        ),
    )
    return log_probs

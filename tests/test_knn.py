"""kNN / occupancy oracle tests: the dense jax implementations against
numpy brute force (SURVEY.md §4 item 2 — the reference's pure-tensor
fallback aggregator.py:42-58 is the semantic spec)."""
import jax
import jax.numpy as jnp
import numpy as np

from npcd_tpu.ops.knn import VoxelOccupancy, dense_knn
from npcd_tpu.models.pointnerf.aggregator import compact_valid_samples
from npcd_tpu.utils.config import VoxelGridOptions


def test_dense_knn_vs_bruteforce():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    pts = rng.uniform(-1, 1, (40, 3)).astype(np.float32)
    k, radius = 5, 0.7
    idx, mask = dense_knn(jnp.asarray(x), jnp.asarray(pts), k, radius)
    idx, mask = np.asarray(idx), np.asarray(mask)

    d = np.linalg.norm(x[:, None] - pts[None], axis=-1)
    for i in range(len(x)):
        order = np.argsort(d[i])[:k]
        got = set(idx[i][mask[i]])
        expected = {j for j in order if d[i, j] < radius}
        assert got == expected, i
        # distances of valid neighbors match the k smallest within radius
        np.testing.assert_allclose(
            np.sort(d[i, list(got)]), np.sort([d[i, j] for j in expected]), rtol=1e-5
        )


def test_occupancy_query():
    opts = VoxelGridOptions()
    rng = np.random.default_rng(1)
    pts = rng.uniform(-0.9, 0.9, (2, 30, 3)).astype(np.float32)
    occ = VoxelOccupancy.build(jnp.asarray(pts), opts)

    queries = rng.uniform(-1.2, 1.2, (2, 200, 3)).astype(np.float32)
    got = np.asarray(occ.query(jnp.asarray(queries)))

    # numpy oracle: dilated occupancy
    vsize = np.asarray(opts.scaled_voxel_size)
    lo = np.asarray(opts.ranges[:3])
    dims = occ.dims
    for b in range(2):
        grid = np.zeros(dims, bool)
        cells = np.floor((pts[b] - lo) / vsize).astype(int)
        for c in cells:
            if (c >= 0).all() and (c < dims).all():
                grid[tuple(c)] = True
        # dilate 3x3x3
        dil = np.zeros_like(grid)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    sl = lambda d: slice(max(d, 0), None) if d >= 0 else slice(None, d)
                    src = grid[
                        slice(max(-dx, 0), dims[0] - max(dx, 0)),
                        slice(max(-dy, 0), dims[1] - max(dy, 0)),
                        slice(max(-dz, 0), dims[2] - max(dz, 0)),
                    ]
                    dil[
                        slice(max(dx, 0), dims[0] - max(-dx, 0)),
                        slice(max(dy, 0), dims[1] - max(-dy, 0)),
                        slice(max(dz, 0), dims[2] - max(-dz, 0)),
                    ] |= src
        qc = np.floor((queries[b] - lo) / vsize).astype(int)
        in_range = ((qc >= 0) & (qc < dims)).all(-1)
        expected = np.zeros(len(queries[b]), bool)
        for i, (c, ir) in enumerate(zip(qc, in_range)):
            expected[i] = ir and dil[tuple(np.clip(c, 0, np.array(dims) - 1))]
        np.testing.assert_array_equal(got[b], expected)


def test_compact_valid_samples():
    valid = jnp.asarray(
        [[False, True, False, True, True, True, False, True]]
    )
    depths = jnp.asarray([[0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0]])
    d, m = compact_valid_samples(valid, depths, 3)
    # first 3 valid depths, in order
    np.testing.assert_array_equal(np.asarray(m), [[True, True, True]])
    np.testing.assert_allclose(np.asarray(d), [[1.0, 3.0, 4.0]])

    # fewer valid than M -> prefix mask
    valid2 = jnp.asarray([[False, True, False, False, False, False, False, False]])
    d2, m2 = compact_valid_samples(valid2, depths, 3)
    np.testing.assert_array_equal(np.asarray(m2), [[True, False, False]])
    assert np.asarray(d2)[0, 0] == 1.0


def test_pallas_knn_interpret_matches_xla():
    """Pallas kNN kernel vs the XLA path in interpreter mode on CPU."""
    import pytest
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-1, 1, (700, 3)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-1, 1, (130, 3)).astype(np.float32))
    i_ref, m_ref = dense_knn(x, pts, 8, 0.5, impl="xla")
    try:
        with pltpu.force_tpu_interpret_mode():
            i_p, m_p = dense_knn(x, pts, 8, 0.5, impl="pallas")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    # The packed-key kernel steals log2(P) mantissa bits from d^2 for the
    # tie-break, so neighbors whose distances differ by <~2^-14 relative may
    # swap order vs lax.top_k. Compare distances (tight tolerance) and
    # require index agreement wherever the swap window doesn't apply.
    i_p, m_p, i_ref, m_ref = map(np.asarray, (i_p, m_p, i_ref, m_ref))
    np.testing.assert_array_equal(m_p, m_ref)
    d_ref = np.linalg.norm(np.asarray(x)[:, None] - np.asarray(pts)[i_ref], axis=-1)
    d_p = np.linalg.norm(np.asarray(x)[:, None] - np.asarray(pts)[i_p], axis=-1)
    np.testing.assert_allclose(d_p, d_ref, rtol=1e-4, atol=1e-6)
    mismatch = i_p != i_ref
    assert mismatch.mean() < 1e-3, f"too many index mismatches: {mismatch.sum()}"


def test_pallas_knn_tie_breaking_interpret():
    """Duplicate points (exact distance ties) resolve to the lower index,
    matching lax.top_k."""
    import pytest
    from jax.experimental.pallas import tpu as pltpu

    pts = jnp.asarray(np.array([[0.0, 0, 0]] * 4 + [[1.0, 0, 0]] * 3, np.float32))
    x = jnp.asarray(np.array([[0.1, 0, 0]], np.float32))
    i_ref, m_ref = dense_knn(x, pts, 5, 2.0, impl="xla")
    try:
        with pltpu.force_tpu_interpret_mode():
            i_p, m_p = dense_knn(x, pts, 5, 2.0, impl="pallas")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_ref))


def test_within_radius_matches_xla():
    """within_radius Pallas kernel (interpret mode on CPU) vs the XLA
    min-distance path, batched, with P not a lane multiple and N not a
    block multiple — pins the lane-compact output reshape and the
    num_points masking."""
    import jax
    import numpy as np
    import pytest
    from npcd_tpu.ops.knn import within_radius

    key = jax.random.PRNGKey(11)
    kx, kp = jax.random.split(key)
    x = jax.random.uniform(kx, (3, 1500, 3), minval=-0.6, maxval=0.6)
    pts = jax.random.uniform(kp, (3, 37, 3), minval=-0.4, maxval=0.4)
    a = within_radius(x, pts, 0.2, impl="xla")
    assert a.shape == (3, 1500)
    assert bool(a.any()) and not bool(a.all())

    from jax.experimental.pallas import tpu as pltpu

    try:
        with pltpu.force_tpu_interpret_mode():
            b = within_radius(x, pts, 0.2, impl="pallas")
    except Exception as e:  # pragma: no cover - interpret mode availability
        pytest.skip(f"pallas interpret mode unavailable: {e}")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

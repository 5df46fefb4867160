"""Checkpoint save/restore round-trip tests incl. EMA and normalizer stats
(SURVEY.md §4 item 5; reference checkpoint_utils.py semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from npcd_tpu.models.diffusion import DiffusionModel
from npcd_tpu.train.diffusion_training import DiffusionTrainState
from npcd_tpu.utils.checkpoint import (
    CheckpointSaver,
    load_weights_only,
    save_weights_only,
)


@pytest.fixture
def state():
    model = DiffusionModel(coords_dim=3, feats_dim=4, num_points=8,
                           width=16, layers=1, heads=2, attn_impl="einsum")
    tx = optax.adamw(1e-3)
    dstate = model.init(jax.random.PRNGKey(0))
    dstate = model.fit_normalizers(
        dstate,
        np.random.default_rng(0).normal(size=(3, 100)),
        np.random.default_rng(1).normal(size=(4, 100)),
    )
    return DiffusionTrainState(
        params=dstate.params,
        opt_state=tx.init(dstate.params),
        ema_params=(jax.tree_util.tree_map(lambda p: p + 1.0, dstate.params),),
        step=jnp.asarray(7, jnp.int32),
        coords_norm=dstate.coords_norm,
        feats_norm=dstate.feats_norm,
    )


def _trees_equal(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_roundtrip_and_naming(tmp_path, state):
    saver = CheckpointSaver(str(tmp_path), "diffusion_training", max_to_keep=3)
    path = saver.save(jax.device_get(state), 123)
    assert path.endswith("diffusion_training-iter-000000123")
    restored, it = saver.restore(state)
    assert it == 123
    _trees_equal(restored, state)
    assert int(restored.step) == 7
    np.testing.assert_allclose(
        np.asarray(restored.coords_norm.scale), np.asarray(state.coords_norm.scale)
    )


def test_keep_n_gc(tmp_path, state):
    saver = CheckpointSaver(str(tmp_path), "ck", max_to_keep=2)
    for it in [1, 2, 3, 4]:
        saver.save(jax.device_get(state), it)
    kept = [it for it, _ in saver.list_checkpoints()]
    assert kept == [3, 4]


def test_async_save_roundtrip_and_gc(tmp_path, state):
    """async_save=True: save() returns before the write is committed
    (finalize renames a tmp dir into place), finish() makes it durable, and
    keep-N GC accounts for the in-flight snapshot. Restored state must be
    bit-identical to the sync path's."""
    saver = CheckpointSaver(str(tmp_path), "ck", max_to_keep=2, async_save=True)
    host = jax.device_get(state)
    for it in [1, 2, 3]:
        saver.save(host, it)
    saver.finish()
    kept = [it for it, _ in saver.list_checkpoints()]
    assert kept == [2, 3]
    restored, it = saver.restore(state)
    assert it == 3
    _trees_equal(restored, state)

    # back-to-back saves serialize (at most one in flight) and a finish()
    # with nothing in flight is a no-op
    saver.save(host, 4)
    saver.save(host, 5)
    saver.finish()
    saver.finish()
    assert [it for it, _ in saver.list_checkpoints()] == [4, 5]


def test_weights_only(tmp_path, state):
    p = str(tmp_path / "weights")
    save_weights_only(p, jax.device_get(state.params))
    loaded = load_weights_only(p, state.params)
    _trees_equal(loaded, state.params)


def test_layout_meta_mismatch_detected(tmp_path, state):
    """A checkpoint saved under a different fused-qkv grouping has identical
    array shapes (restore would silently permute attention channels); the
    layout sidecar must make both the saver and the weights-only paths fail
    loudly (ADVICE r2: qkv layout versioning)."""
    host = jax.device_get(state)

    saver = CheckpointSaver(str(tmp_path / "full"), "ck", layout_meta={"qkv_groups": 1})
    saver.save(host, 1)
    ok = CheckpointSaver(str(tmp_path / "full"), "ck", layout_meta={"qkv_groups": 1})
    ok.restore(state)  # matching layout restores fine
    bad = CheckpointSaver(str(tmp_path / "full"), "ck", layout_meta={"qkv_groups": 2})
    with pytest.raises(ValueError, match="qkv_groups"):
        bad.restore(state)

    p = str(tmp_path / "weights")
    save_weights_only(p, host.params, layout_meta={"qkv_groups": 1})
    load_weights_only(p, state.params, expected_layout={"qkv_groups": 1})
    with pytest.raises(ValueError, match="qkv_groups"):
        load_weights_only(p, state.params, expected_layout={"qkv_groups": 2})

    # pre-versioning checkpoint (no sidecar): warn, don't raise
    p2 = str(tmp_path / "weights_legacy")
    save_weights_only(p2, host.params)
    load_weights_only(p2, state.params, expected_layout={"qkv_groups": 2})


def test_layout_meta_gc_removes_sidecar(tmp_path, state):
    import os

    host = jax.device_get(state)
    saver = CheckpointSaver(str(tmp_path), "ck", max_to_keep=1,
                            layout_meta={"qkv_groups": 2})
    saver.save(host, 1)
    saver.save(host, 2)
    names = sorted(os.listdir(tmp_path))
    assert names == ["ck-iter-000000002", "ck-iter-000000002.layout.json"]


def test_load_weights_only_tolerant_shape_mismatch(tmp_path):
    """FlexEmbedding semantics (reference flex_embedding.py:9-26): a leaf
    saved with a different shape (e.g. n_obj mismatch) restores to the
    target's initialized value with a warning instead of raising."""
    import numpy as np

    saved = {
        "coords_table": jnp.ones((4, 8, 3)),
        "mlp": {"w": jnp.full((5, 5), 2.0)},
    }
    p = str(tmp_path / "weights")
    save_weights_only(p, saved)

    target = {
        "coords_table": jnp.zeros((6, 8, 3)),  # different n_obj
        "mlp": {"w": jnp.zeros((5, 5))},
    }
    # strict restore raises
    import pytest

    with pytest.raises(Exception):
        load_weights_only(p, target)
    # tolerant restore: mismatched leaf keeps target init, others load
    out = load_weights_only(p, target, tolerant=True)
    np.testing.assert_array_equal(np.asarray(out["coords_table"]),
                                  np.zeros((6, 8, 3)))
    np.testing.assert_array_equal(np.asarray(out["mlp"]["w"]),
                                  np.full((5, 5), 2.0))

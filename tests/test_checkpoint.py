import jax.numpy as jnp
import numpy as np

from radialog_tpu.core.checkpoint import (BestKeeper, latest_step,
                                          load_checkpoint, save_checkpoint)


def _tree(v=1.0):
    return {"a": jnp.full((4, 4), v), "nested": {"b": jnp.arange(3)}}


def test_save_load_roundtrip(tmp_path):
    save_checkpoint(tmp_path, 7, _tree(2.5), {"note": "x"})
    tree, meta = load_checkpoint(tmp_path, "step_7", target=_tree())
    np.testing.assert_allclose(np.asarray(tree["a"]), 2.5)
    assert meta["step"] == 7 and meta["note"] == "x"
    assert latest_step(tmp_path) == 7


def test_best_keeper(tmp_path):
    bk = BestKeeper(tmp_path, mode="max")
    assert bk.update(1, 0.5, _tree(1.0))
    assert not bk.update(2, 0.3, _tree(2.0))
    assert bk.update(3, 0.9, _tree(3.0))
    best, meta_b = load_checkpoint(tmp_path, "best", target=_tree())
    last, meta_l = load_checkpoint(tmp_path, "last", target=_tree())
    assert meta_b["metric"] == 0.9 and meta_l["step"] == 3
    np.testing.assert_allclose(np.asarray(best["a"]), 3.0)

"""Keras h5 checkpoint import/export roundtrip."""

import jax
import numpy as np

from radian_tpu.models import build_model, init_params
from radian_tpu.models.keras_import import export_keras_h5, load_keras_h5


def test_h5_roundtrip(tmp_path):
    model = build_model()
    params = init_params(model, jax.random.PRNGKey(3))
    path = tmp_path / "model-01.h5"
    export_keras_h5(params, path)
    loaded = load_keras_h5(path)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(
        ("/".join(str(p.key) for p in kp), v)
        for kp, v in jax.tree_util.tree_leaves_with_path(loaded)
    )
    assert len(flat_a) == len(flat_b)
    for kp, v in flat_a:
        key = "/".join(str(p.key) for p in kp)
        np.testing.assert_array_equal(np.asarray(v), flat_b[key], err_msg=key)


def test_imported_params_run(tmp_path):
    model = build_model()
    params = init_params(model, jax.random.PRNGKey(3))
    path = tmp_path / "ckpt.h5"
    export_keras_h5(params, path)
    loaded = load_keras_h5(path)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1024, 1))
    y0 = model.apply({"params": params}, x, probs=True)
    y1 = model.apply({"params": jax.tree.map(np.asarray, loaded)}, x, probs=True)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

"""Cross-framework model check: our flax TCN vs a TF/Keras build.

Builds the reference network shape with keras's own layers (Conv1D with
``padding='causal'``, the exact substrate keras-tcn delegates to —
reference model.py:71-75 via keras-tcn 3.5), loads OUR weights into it,
and asserts the outputs agree.  This validates causal-conv semantics,
residual wiring and head against an independent implementation.
"""

import numpy as np
import pytest

# keras-semantics crosscheck; the imported contract rarely changes
pytestmark = pytest.mark.slow

from radian_tpu.config import default_config
from radian_tpu.models import build_model, init_params


@pytest.mark.filterwarnings("ignore")
def test_model_matches_keras_reference_build(rng):
    tf = pytest.importorskip("tensorflow")
    import jax

    cfg = default_config()
    cfg.model.tcn.nb_filters = 16
    cfg.model.tcn.dilations = [1, 2, 4]
    cfg.model.relu_units = 16
    cfg.model.timesteps = 128

    model = build_model(cfg)
    params = init_params(model, jax.random.PRNGKey(0), window_size=128)

    # keras build of the same architecture (keras-tcn 3.5 semantics)
    inp = tf.keras.Input((128, 1))
    x = inp
    t = cfg.model.tcn
    convs = []
    for d in t.dilations:
        block_in = x
        for j in range(2):
            c = tf.keras.layers.Conv1D(
                t.nb_filters, t.kernel_size, dilation_rate=d,
                padding="causal",
            )
            x = c(x)
            convs.append(c)
            x = tf.keras.layers.Activation("relu")(x)
        if block_in.shape[-1] != t.nb_filters:
            sc = tf.keras.layers.Conv1D(t.nb_filters, 1)
            block_in = sc(block_in)
            convs.append(sc)
        x = tf.keras.layers.Activation("relu")(
            tf.keras.layers.Add()([block_in, x])
        )
    d1 = tf.keras.layers.Dense(cfg.model.relu_units)
    x = tf.keras.layers.Activation("relu")(d1(x))
    d2 = tf.keras.layers.Dense(cfg.model.softmax_units)
    x = tf.keras.layers.Activation("softmax")(d2(x))
    kmodel = tf.keras.Model(inp, x)

    # load our weights into the keras layers
    ci = 0
    for bi in range(len(t.dilations)):
        b = params["tcn"][f"block{bi}"]
        for j in range(2):
            convs[ci].set_weights([
                np.asarray(b[f"conv{j}"]["Conv_0"]["kernel"]),
                np.asarray(b[f"conv{j}"]["Conv_0"]["bias"]),
            ])
            ci += 1
        if "shortcut" in b:
            convs[ci].set_weights([
                np.asarray(b["shortcut"]["kernel"]),
                np.asarray(b["shortcut"]["bias"]),
            ])
            ci += 1
    d1.set_weights([np.asarray(params["dense_relu"]["kernel"]),
                    np.asarray(params["dense_relu"]["bias"])])
    d2.set_weights([np.asarray(params["dense_out"]["kernel"]),
                    np.asarray(params["dense_out"]["bias"])])

    x_in = rng.normal(size=(2, 128, 1)).astype(np.float32)
    ours = np.asarray(model.apply({"params": params}, x_in, probs=True))
    theirs = kmodel(x_in).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)

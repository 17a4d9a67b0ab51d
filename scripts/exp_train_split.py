"""Bisect the train-step cost on the chip: forward loss only, grad of
the model with a dummy loss, grad of CTC only, full step."""

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path("bench_data/.jax_cache").absolute()))

import jax
import jax.numpy as jnp
import numpy as np

from radian_tpu.config import default_config
from radian_tpu.models import build_model, init_params
from radian_tpu.ops.ctc import ctc_loss


def timeit(tag, fn, *args):
    sum1 = jax.jit(lambda x: x.sum())
    out = fn(*args)
    np.asarray(sum1(jax.tree_util.tree_leaves(out)[0]))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(sum1(jax.tree_util.tree_leaves(out)[0]))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:28s} {best*1e3:8.1f} ms", flush=True)


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    print(f"devices: {jax.devices()} bs={bs}", flush=True)
    cfg = default_config()
    model = build_model(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(bs, 1024, 1)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, (bs, 64)).astype(np.int32))
    lab_len = jnp.full((bs,), 26, jnp.int32)
    in_len = jnp.full((bs,), 1024, jnp.int32)

    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x, train=True))
    timeit("forward (logprobs)", fwd, params, x)

    fwd_sum = jax.jit(jax.grad(
        lambda p, x: model.apply({"params": p}, x, train=True).sum()
    ))
    timeit("grad(model, dummy loss)", fwd_sum, params, x)

    lp = fwd(params, x)
    ctc_g = jax.jit(jax.grad(
        lambda lp: ctc_loss(lp, in_len, labels, lab_len).mean()
    ))
    timeit("grad(ctc only)", ctc_g, lp)

    full_g = jax.jit(jax.grad(
        lambda p, x: ctc_loss(
            model.apply({"params": p}, x, train=True),
            in_len, labels, lab_len).mean()
    ))
    timeit("grad(model+ctc)", full_g, params, x)


if __name__ == "__main__":
    main()

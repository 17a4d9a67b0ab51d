"""Optimizer construction from config.

Covers the reference's optimizer menu (reference radian/model.py:100-153):
adam (with optional clipnorm/clipvalue), sgd (momentum/nesterov + clips),
adagrad, and the causalcall-style piecewise-constant-decay Adam
('cc_opt').

Note a reference quirk intentionally *not* reproduced: the reference
evaluates its PiecewiseConstantDecay schedule at a constant step-0
Variable (reference model.py:147-153), so its 'cc_opt' actually trains at
the fixed initial rate.  Here the schedule really decays with the step;
``cc_opt_fixed_rate=True`` restores the reference behavior.
"""

from __future__ import annotations

import optax

from radian_tpu.config import DotDict


def build_optimizer(opt_config: DotDict,
                    cc_opt_fixed_rate: bool = False) -> optax.GradientTransformation:
    kind = opt_config.type
    if kind == "adam":
        c = opt_config.adam
        tx = optax.adam(
            learning_rate=c.lr, b1=c.beta_1, b2=c.beta_2, eps=c.epsilon,
        )
        if c.get("amsgrad"):
            tx = optax.amsgrad(
                learning_rate=c.lr, b1=c.beta_1, b2=c.beta_2, eps=c.epsilon
            )
        return _with_clips(tx, c)
    if kind == "sgd":
        c = opt_config.sgd
        momentum = c.momentum if c.momentum else None
        tx = optax.sgd(learning_rate=c.lr, momentum=momentum,
                       nesterov=bool(c.nesterov))
        return _with_clips(tx, c)
    if kind == "adagrad":
        return optax.adagrad(learning_rate=opt_config.adagrad.lr)
    if kind == "cc_opt":
        c = opt_config.cc_opt
        values = [c.init_rate * d for d in c.decays]
        if cc_opt_fixed_rate:
            return optax.adam(learning_rate=values[0])
        boundaries = [int(c.max_steps * b) for b in c.boundaries]
        schedule = optax.join_schedules(
            [optax.constant_schedule(v) for v in values], boundaries
        )
        return optax.adam(learning_rate=schedule)
    raise ValueError(f"unknown optimizer type {kind!r}")


def _with_clips(tx: optax.GradientTransformation, c: DotDict):
    if c.get("clipnorm"):
        return optax.chain(optax.clip_by_global_norm(float(c.clipnorm)), tx)
    if c.get("clipvalue"):
        return optax.chain(optax.clip(float(c.clipvalue)), tx)
    return tx

"""Minimal functional train state (params + optax optimizer state).

Optimizer is ``optax.adam`` with torch defaults (b1=0.9, b2=0.999, eps=1e-8),
matching the reference's ``optim.Adam`` including bias correction and eps
placement.  Unlike the reference, optimizer state IS part of the checkpointed
state (the reference never saves it — SURVEY.md §5.4).
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: dict
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(lr: float) -> optax.GradientTransformation:
    return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)


def create(params: dict, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def apply_gradients(state: TrainState, grads: dict,
                    optimizer: optax.GradientTransformation) -> TrainState:
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params=params, opt_state=opt_state, step=state.step + 1)

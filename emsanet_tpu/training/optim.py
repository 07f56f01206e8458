"""Optimizers.

Reference: `emsanet/optimizer.py:19-59` — SGD(nesterov, momentum 0.9,
coupled weight decay 1e-4, the torch default that decays *all* params
including norms/biases), Adam, AdamW, RAdam.

The learning rate is injected via `optax.inject_hyperparams` so the
per-epoch OneCycle schedule (stepped once per epoch, not per step —
lr_scheduler.py:22-31) can update it without re-jitting.
"""

from __future__ import annotations

import optax

KNOWN_OPTIMIZERS = ("sgd", "adam", "adamw", "radam")


def get_optimizer(cfg) -> optax.GradientTransformation:
    """cfg: TrainConfig."""
    name = cfg.optimizer.lower()
    if name not in KNOWN_OPTIMIZERS:
        raise ValueError(f"Unknown optimizer: '{name}'")

    wd = cfg.weight_decay

    @optax.inject_hyperparams
    def make(learning_rate):
        if name == "sgd":
            # torch-coupled weight decay: grad += wd * param BEFORE momentum
            return optax.chain(
                optax.add_decayed_weights(wd),
                optax.sgd(
                    learning_rate, momentum=cfg.momentum, nesterov=True
                ),
            )
        if name == "adam":
            # torch Adam: coupled (L2) weight decay
            return optax.chain(
                optax.add_decayed_weights(wd),
                optax.adam(learning_rate, b1=0.9, b2=0.999),
            )
        if name == "adamw":
            return optax.adamw(
                learning_rate, b1=0.9, b2=0.999, weight_decay=wd
            )
        if name == "radam":
            return optax.chain(
                optax.add_decayed_weights(wd),
                optax.radam(learning_rate, b1=0.9, b2=0.999),
            )
        raise AssertionError

    return make(learning_rate=cfg.learning_rate)


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning rate (per-epoch OneCycle step)."""
    import jax.numpy as jnp

    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state

"""Optimizer factories (optax) matching the reference's torch.optim usage.

``adam`` mirrors torch.optim.Adam semantics: L2 weight decay is added to the
gradient BEFORE the moment updates (coupled, unlike AdamW).
"""
from __future__ import annotations

import optax


def adam(lr: float = 1e-3, weight_decay: float = 0.0,
         betas=(0.9, 0.999), eps: float = 1e-8,
         schedule=None) -> optax.GradientTransformation:
    learning_rate = schedule if schedule is not None else lr
    tx = optax.adam(learning_rate, b1=betas[0], b2=betas[1], eps=eps)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


def adamw(lr: float = 1e-3, weight_decay: float = 0.01,
          betas=(0.9, 0.999), eps: float = 1e-8,
          schedule=None) -> optax.GradientTransformation:
    learning_rate = schedule if schedule is not None else lr
    return optax.adamw(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                       weight_decay=weight_decay)

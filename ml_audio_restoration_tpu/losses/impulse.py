"""Impulse/transient loss for the denoiser
(reference Trainer._impulse_loss, /root/reference/src/training/trainer.py:303-330):
L1 on second derivatives + 0.5x a transient error masked where the target's
first-derivative magnitude exceeds 2x its mean.
"""
from __future__ import annotations

import jax.numpy as jnp


def impulse_loss(output, target):
    """output/target: [B, T, C] -> scalar."""
    out_d1 = jnp.abs(output[:, 1:] - output[:, :-1])
    tgt_d1 = jnp.abs(target[:, 1:] - target[:, :-1])
    out_d2 = jnp.abs(out_d1[:, 1:] - out_d1[:, :-1])
    tgt_d2 = jnp.abs(tgt_d1[:, 1:] - tgt_d1[:, :-1])

    l1_d2 = jnp.mean(jnp.abs(out_d2 - tgt_d2))

    transient_error = jnp.abs(out_d1 - tgt_d1)
    high_energy = (tgt_d1 > jnp.mean(tgt_d1) * 2.0).astype(output.dtype)
    weighted = jnp.mean(transient_error * high_energy)
    return l1_d2 + weighted * 0.5

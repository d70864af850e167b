"""Semi-supervised loss suite for mixed synthetic + real-degraded training.

Parity target: /root/reference/src/training/semi_supervised.py:16-219 —
supervised MSE on synthetic samples, a consistency regularizer for real
degraded audio (smoothness hinge x0.3 + energy MSE x0.2 + rfft log-magnitude
L1 x0.5), cycle consistency (re-degrade the restored audio, denoise again,
0.5*MSE(re-restored, restored) + 0.5*MSE(restored, clean)), and a cosine
contrastive loss (stubbed to weight 0 in the reference, implemented here).

Masking note: the reference indexes batches with boolean masks (dynamic
shapes). Under jit we compute every branch over the full batch and weight by
the mask — identical expectation, static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _masked_mean(x, mask):
    """Mean of x over elements whose batch entry has mask=1.

    x: [B, ...], mask: [B] in {0,1}. Matches `tensor[mask].mean()` exactly.
    """
    per_item = jnp.mean(x.reshape(x.shape[0], -1), axis=-1)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(per_item * mask) / denom


def supervised_loss(output, target, mask=None):
    sq = jnp.square(output - target)
    if mask is None:
        return jnp.mean(sq)
    return _masked_mean(sq, mask)


def consistency_loss(output, inputs, mask=None):
    """Regularizer for real degraded audio (no ground truth).

    output/inputs: [B, T, C]. The three terms follow semi_supervised.py:45-83.
    """
    out_diff = jnp.abs(output[:, 1:] - output[:, :-1])
    in_diff = jnp.abs(inputs[:, 1:] - inputs[:, :-1])
    if mask is None:
        smoothness = jax.nn.relu(jnp.mean(out_diff) - jnp.mean(in_diff) * 0.5)
        energy = jnp.mean(jnp.square(
            jnp.sum(output**2, axis=1) - jnp.sum(inputs**2, axis=1)))
    else:
        smoothness = jax.nn.relu(
            _masked_mean(out_diff, mask) - _masked_mean(in_diff, mask) * 0.5)
        energy = _masked_mean(jnp.square(
            jnp.sum(output**2, axis=1) - jnp.sum(inputs**2, axis=1)), mask)

    n_fft = min(2048, inputs.shape[1])
    out_mag = jnp.abs(jnp.fft.rfft(output, n=n_fft, axis=1))
    in_mag = jnp.abs(jnp.fft.rfft(inputs, n=n_fft, axis=1))
    log_l1 = jnp.abs(jnp.log(out_mag + _EPS) - jnp.log(in_mag + _EPS))
    spectral = jnp.mean(log_l1) if mask is None else _masked_mean(log_l1, mask)

    return smoothness * 0.3 + energy * 0.2 + spectral * 0.5


def contrastive_loss(features_a, features_b, label):
    """Cosine-similarity MSE against a same/different-type label
    (semi_supervised.py:85-108 — a stub in the reference, functional here)."""
    a = features_a / (jnp.linalg.norm(features_a, axis=-1, keepdims=True) + _EPS)
    b = features_b / (jnp.linalg.norm(features_b, axis=-1, keepdims=True) + _EPS)
    similarity = jnp.sum(a * b, axis=-1)
    return jnp.mean(jnp.square(similarity - label.astype(similarity.dtype)))


def cycle_consistency_loss(restored, clean, redegrade_fn, model_fn, mask=None):
    """clean -> degrade -> restore -> re-degrade -> restore again.

    redegrade_fn: stop-gradient artifact resynthesis (PRNG-keyed, on-device).
    model_fn: params-closed forward pass.
    """
    re_degraded = jax.lax.stop_gradient(redegrade_fn(restored))
    re_restored = model_fn(re_degraded)
    cycle = jnp.square(re_restored - restored)
    clean_term = jnp.square(restored - clean)
    if mask is None:
        return jnp.mean(cycle) * 0.5 + jnp.mean(clean_term) * 0.5
    return _masked_mean(cycle, mask) * 0.5 + _masked_mean(clean_term, mask) * 0.5


def semi_supervised_loss(output, inputs, target, is_synthetic, *,
                         model_fn=None, redegrade_fn=None,
                         supervised_weight: float = 1.0,
                         consistency_weight: float = 0.3,
                         cycle_weight: float = 0.2):
    """Combined loss. is_synthetic: [B] float/bool mask.

    Returns (total, dict of components).
    """
    syn = is_synthetic.astype(output.dtype)
    real = 1.0 - syn
    losses = {}
    total = 0.0

    sup = supervised_loss(output, target, syn)
    losses["supervised"] = sup
    total += sup * supervised_weight

    if consistency_weight > 0:
        cons = consistency_loss(output, inputs, real)
        losses["consistency"] = cons
        total += cons * consistency_weight

    if cycle_weight > 0 and model_fn is not None and redegrade_fn is not None:
        cyc = cycle_consistency_loss(output, target, redegrade_fn, model_fn, syn)
        losses["cycle"] = cyc
        total += cyc * cycle_weight

    losses["total"] = total
    return total, losses

"""Shared functional building blocks for the model families.

Design: models are *pure functions over pytrees*. Each model module exposes
  init(key, **cfg)  -> (params, state)     # trainable params / BN running stats
  apply(params, state, x, train=False)     -> (y, new_state)
No module framework — params are nested dicts whose shapes and names map 1:1
onto the reference's torch modules, which keeps the .pth weight converter
(compat/torch_loader.py) a mechanical transpose.

Initializers reproduce torch defaults (kaiming-uniform a=sqrt(5) == U(±1/√fan_in))
so from-scratch training starts from the same distribution the reference does.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops import conv1d, leaky_relu, batch_norm, batch_norm_train


def conv_init(key, k: int, in_ch: int, out_ch: int, dtype=jnp.float32):
    """torch.nn.Conv1d default init; weight stored [k, in, out] (WIO)."""
    kw, kb = jax.random.split(key)
    fan_in = in_ch * k
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": jax.random.uniform(kw, (k, in_ch, out_ch), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (out_ch,), dtype, -bound, bound),
    }


def conv_transpose_init(key, k: int, in_ch: int, out_ch: int, dtype=jnp.float32):
    """torch.nn.ConvTranspose1d default init (fan_in = out_ch * k — torch
    computes fan-in from dim 1 of its [in, out, k] weight)."""
    kw, kb = jax.random.split(key)
    fan_in = out_ch * k
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": jax.random.uniform(kw, (k, in_ch, out_ch), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (out_ch,), dtype, -bound, bound),
    }


def bn_init(ch: int, dtype=jnp.float32):
    params = {"scale": jnp.ones((ch,), dtype), "bias": jnp.zeros((ch,), dtype)}
    state = {"mean": jnp.zeros((ch,), dtype), "var": jnp.ones((ch,), dtype)}
    return params, state


def bn_apply(params, state, x, train: bool, axis_name: str | None = None):
    if train:
        y, new_mean, new_var = batch_norm_train(
            x, params["scale"], params["bias"], state["mean"], state["var"],
            axis_name=axis_name,
        )
        return y, {"mean": new_mean, "var": new_var}
    y = batch_norm(x, params["scale"], params["bias"], state["mean"], state["var"])
    return y, state


def fold_conv_bn(conv_p, bn_p, bn_s, eps: float = 1e-5):
    """Fold inference-mode batch norm into the preceding conv's weights:
    conv(x, w, b) then BN == conv(x, w*g, (b-mean)*g + beta) with
    g = scale*rsqrt(var+eps). The transform touches only the (tiny) weights,
    eliminating a full elementwise pass over the activation tensor — on TPU
    that pass is pure HBM traffic the conv epilogue doesn't need.

    Dtype contract: the fold is computed in f32 (it involves rsqrt over
    running variances) and the result is cast to the CONV WEIGHT's dtype,
    so bf16-cast params + f32 BN state — the Trainer's AMP eval path, which
    casts params but keeps model_state in f32 — fold to bf16 weights
    instead of silently promoting to f32 and crashing the conv on mixed
    dtypes. (The serving pipeline casts params AND state together, which
    already agreed; computing in f32 only tightens that path.)"""
    import jax.numpy as jnp
    from jax import lax

    w_dtype = conv_p["w"].dtype
    f32 = jnp.float32
    g = bn_p["scale"].astype(f32) * lax.rsqrt(bn_s["var"].astype(f32) + eps)
    w = (conv_p["w"].astype(f32) * g).astype(w_dtype)  # [k, in, out] * [out]
    b = ((conv_p["b"].astype(f32) - bn_s["mean"].astype(f32)) * g
         + bn_p["bias"].astype(f32)).astype(w_dtype)
    return w, b


def conv_bn_lrelu_init(key, k: int, in_ch: int, out_ch: int, *, dilation: int = 1):
    p = {"conv": conv_init(key, k, in_ch, out_ch)}
    bn_p, bn_s = bn_init(out_ch)
    p["bn"] = bn_p
    return p, {"bn": bn_s}, dilation


def conv_bn_lrelu_apply(p, s, x, train: bool, *, padding: int, dilation: int = 1,
                        axis_name: str | None = None):
    if not train:
        w, b = fold_conv_bn(p["conv"], p["bn"], s["bn"])
        x = conv1d(x, w, b, padding=padding, dilation=dilation)
        return leaky_relu(x), s
    x = conv1d(x, p["conv"]["w"], p["conv"]["b"], padding=padding, dilation=dilation)
    x, bn_s = bn_apply(p["bn"], s["bn"], x, train, axis_name)
    return leaky_relu(x), {"bn": bn_s}


def double_conv_block_init(key, in_ch: int, out_ch: int):
    """The U-Net conv block: (conv3-BN-LeakyReLU) x2
    (reference _conv_block, denoiser.py:51-60)."""
    k1, k2 = jax.random.split(key)
    p1, s1, _ = conv_bn_lrelu_init(k1, 3, in_ch, out_ch)
    p2, s2, _ = conv_bn_lrelu_init(k2, 3, out_ch, out_ch)
    return {"c1": p1, "c2": p2}, {"c1": s1, "c2": s2}


def double_conv_block_apply(p, s, x, train: bool, axis_name: str | None = None):
    x, s1 = conv_bn_lrelu_apply(p["c1"], s["c1"], x, train, padding=1,
                                axis_name=axis_name)
    x, s2 = conv_bn_lrelu_apply(p["c2"], s["c2"], x, train, padding=1,
                                axis_name=axis_name)
    return x, {"c1": s1, "c2": s2}


def count_params(tree) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))

"""Unidirectional LSTM as an XLA scan.

The reference's StereoSeparator uses a cuDNN LSTM
(/root/reference/src/models/stereo_separator.py:37-43,107) whose sequence
length limits force 2-second chunks everywhere. On TPU there is no fused
LSTM primitive; the TPU-native formulation is:

1. hoist the input projection out of the recurrence — one large
   [B*T, C] @ [C, 4H] matmul that runs on the MXU at full tilt;
2. scan only the tiny recurrent matmul h @ W_hh with `lax.scan`
   (unrolled to amortize loop overhead), batched over as many chunks as
   the caller can provide so the [B, H] @ [H, 4H] step keeps lanes busy.

Weight layout matches torch.nn.LSTM gate order (i, f, g, o) so reference
checkpoints convert directly; biases b_ih and b_hh are pre-summed at
conversion time.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def lstm_init(key, input_size: int, hidden_size: int, dtype=jnp.float32):
    """torch.nn.LSTM-style init: all weights/biases ~ U(-1/sqrt(H), 1/sqrt(H))."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / jnp.sqrt(hidden_size)
    u = lambda k, shape: jax.random.uniform(k, shape, dtype, -bound, bound)
    return {
        "w_ih": u(k1, (input_size, 4 * hidden_size)),
        "w_hh": u(k2, (hidden_size, 4 * hidden_size)),
        # two separate bias vectors in torch; kept separate for converter parity
        "b_ih": u(k3, (4 * hidden_size,)),
        "b_hh": u(k4, (4 * hidden_size,)),
    }


def lstm(x, params, *, unroll: int = 8):
    """Run a single-layer unidirectional LSTM over [B, T, C] -> [B, T, H].

    Initial hidden/cell state is zero (the reference passes no state across
    chunks — stereo_separator.py:107).
    """
    b, t, _ = x.shape
    h_dim = params["w_hh"].shape[0]
    bias = params["b_ih"] + params["b_hh"]
    # Input projection for the whole sequence: one MXU-sized matmul.
    gates_x = jnp.einsum(
        "btc,ch->bth", x, params["w_ih"], preferred_element_type=x.dtype
    ) + bias
    w_hh = params["w_hh"]

    def step(carry, gx):
        h, c = carry
        g = gx + jnp.dot(h, w_hh, preferred_element_type=h.dtype)
        i, f, gg, o = jnp.split(g, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        gg = jnp.tanh(gg)
        o = jax.nn.sigmoid(o)
        c = f * c + i * gg
        h = o * jnp.tanh(c)
        return (h, c), h

    init = (
        jnp.zeros((b, h_dim), x.dtype),
        jnp.zeros((b, h_dim), x.dtype),
    )
    _, ys = lax.scan(step, init, gates_x.swapaxes(0, 1), unroll=unroll)
    return ys.swapaxes(0, 1)

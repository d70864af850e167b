"""Fused LSTM recurrence as a Pallas TPU kernel.

The XLA `lax.scan` LSTM (ops/lstm.py) pays per-step loop overhead (~2 us/step
measured on v5e) on a recurrence whose per-step math is tiny
([B,64]@[64,256] + elementwise). This kernel removes that wall:

- the input projection stays OUTSIDE (one large MXU matmul over [B*T, C]);
- the kernel streams pre-computed gate activations [T, B, 4H] from HBM
  through VMEM in blocks of `block_t` steps (Pallas double-buffers grid
  blocks automatically), keeps W_hh and the (h, c) carry resident in VMEM,
  and runs the whole recurrence as an in-kernel fori_loop — no XLA
  while-loop dispatch per step;
- TPU grid iterations execute sequentially on a core, so VMEM scratch
  carries (h, c) across blocks.

Used automatically on TPU by ops.lstm.lstm(impl='auto'); the scan path
remains the CPU/parity fallback (bit-compatible gate order i,f,g,o).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lstm_kernel(gx_ref, whh_ref, out_ref, h_ref, c_ref, *, block_t: int,
                 hidden: int):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    def step(t, _):
        h = h_ref[:]
        g = jnp.dot(h, whh_ref[:], preferred_element_type=jnp.float32)
        g = g + gx_ref[t]
        i = jax.nn.sigmoid(g[:, :hidden])
        f = jax.nn.sigmoid(g[:, hidden:2 * hidden])
        gg = jnp.tanh(g[:, 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(g[:, 3 * hidden:])
        c = f * c_ref[:] + i * gg
        h = o * jnp.tanh(c)
        c_ref[:] = c
        h_ref[:] = h
        out_ref[t] = h
        return 0

    jax.lax.fori_loop(0, block_t, step, 0)


def lstm_recurrence_pallas(gates_x, w_hh, *, block_t: int = 64,
                           interpret: bool = False):
    """Run the LSTM recurrence over precomputed gates.

    gates_x: [B, T, 4H] (x @ W_ih + b already applied)
    w_hh: [H, 4H]
    -> [B, T, H]
    """
    b, t, g4 = gates_x.shape
    h_dim = g4 // 4
    bp = _round_up(b, 8)
    tp = _round_up(t, block_t)

    gx = jnp.transpose(gates_x, (1, 0, 2)).astype(jnp.float32)  # [T, B, 4H]
    if bp != b or tp != t:
        gx = jnp.pad(gx, ((0, tp - t), (0, bp - b), (0, 0)))
    w_hh = w_hh.astype(jnp.float32)

    kernel = functools.partial(_lstm_kernel, block_t=block_t, hidden=h_dim)
    out = pl.pallas_call(
        kernel,
        grid=(tp // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, bp, g4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, bp, h_dim), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, bp, h_dim), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bp, h_dim), jnp.float32),
            pltpu.VMEM((bp, h_dim), jnp.float32),
        ],
        interpret=interpret,
    )(gx, w_hh)
    return jnp.transpose(out[:t, :b], (1, 0, 2))

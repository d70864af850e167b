"""Fused LSTM recurrence as a Pallas TPU kernel, with carry I/O.

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
  carries (h, c) across blocks;
- initial state enters as (h0, c0) and the state at the TRUE final step
  (not the block-padded one — padded gate rows are zeros but would still
  advance the recurrence) leaves as (h_f, c_f), so the streaming engine's
  exact block-to-block state continuity (pipeline/streaming.py) runs under
  this kernel too.

Selectable via ops.lstm.lstm(impl='pallas'); the scan path is the
CPU/autodiff/default path (bit-compatible gate order i,f,g,o). Measured
v5e A/Bs (scripts/profile_streaming_ablate.py, 2026-08-20):
- batch inference [60, 88200, 128]: pallas 117 ms vs scan 106 ms — the
  recurrence is latency-bound; the scan's entry cost amortizes over 88k
  steps, so 'auto' stays scan there;
- STREAMING carry regime (batch-16 1-s blocks): pallas 29.55 ms vs scan
  37.23 ms device per feed (+26%, 541 vs 429 realtime streams),
  bit-identical output — the per-feed scan re-entry cost does NOT
  amortize over ~2.7k steps, and the kernel's VMEM-resident carry makes
  block re-entry free. ADOPTED: StreamingRestorer auto-selects this
  kernel on TPU (pipeline/streaming.py, docs/PERFORMANCE.md "Pallas LSTM
  in the streaming regime").
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lstm_kernel(gx_ref, whh_ref, h0_ref, c0_ref, out_ref, hf_ref, cf_ref,
                 h_ref, c_ref, *, block_t: int, hidden: int, t_true: int):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_ref[:] = h0_ref[:]
        c_ref[:] = c0_ref[:]

    base = pl.program_id(0) * block_t

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

        # capture the carry at the TRUE last step: the grid is padded to a
        # block_t multiple, and the padded steps (zero gates) keep advancing
        # (h, c) — the state they produce is NOT the sequence's final state
        @pl.when(base + t == t_true - 1)
        def _capture():
            hf_ref[:] = h
            cf_ref[:] = c

        return 0

    jax.lax.fori_loop(0, block_t, step, 0)


def lstm_recurrence_pallas(gates_x, w_hh, carry=None, *, block_t: int = 64,
                           interpret: bool = False):
    """Run the LSTM recurrence over precomputed gates.

    gates_x: [B, T, 4H] (x @ W_ih + b already applied)
    w_hh: [H, 4H]
    carry: optional (h0, c0), each [B, H] (zeros when None)
    -> ([B, T, H], (h_f, c_f)) — the state after the final true step
    """
    b, t, g4 = gates_x.shape
    h_dim = g4 // 4
    bp = _round_up(b, 8)
    tp = _round_up(t, block_t)

    gx = jnp.transpose(gates_x, (1, 0, 2)).astype(jnp.float32)  # [T, B, 4H]
    if bp != b or tp != t:
        gx = jnp.pad(gx, ((0, tp - t), (0, bp - b), (0, 0)))
    w_hh = w_hh.astype(jnp.float32)
    if carry is None:
        h0 = jnp.zeros((bp, h_dim), jnp.float32)
        c0 = jnp.zeros((bp, h_dim), jnp.float32)
    else:
        h0, c0 = (jnp.pad(s.astype(jnp.float32), ((0, bp - b), (0, 0)))
                  if bp != b else s.astype(jnp.float32) for s in carry)

    kernel = functools.partial(_lstm_kernel, block_t=block_t, hidden=h_dim,
                               t_true=t)
    state_spec = pl.BlockSpec((bp, h_dim), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    out, hf, cf = pl.pallas_call(
        kernel,
        grid=(tp // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, bp, g4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            state_spec,
            state_spec,
        ],
        out_specs=[
            pl.BlockSpec((block_t, bp, h_dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            state_spec,
            state_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, bp, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((bp, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((bp, h_dim), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bp, h_dim), jnp.float32),
            pltpu.VMEM((bp, h_dim), jnp.float32),
        ],
        interpret=interpret,
    )(gx, w_hh, h0, c0)
    return (jnp.transpose(out[:t, :b], (1, 0, 2)),
            (hf[:b], cf[:b]))

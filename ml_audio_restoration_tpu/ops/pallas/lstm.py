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
v5e A/Bs:
- STREAMING carry regime (batch-16 1-s blocks,
  scripts/profile_streaming_ablate.py, 2026-08-20): pallas 29.55 ms vs
  scan 37.23 ms device per feed (+26%, 541 vs 429 realtime streams),
  bit-identical output — the per-feed scan re-entry cost does NOT
  amortize over ~2.7k steps, and the kernel's VMEM-resident carry makes
  block re-entry free. ADOPTED: StreamingRestorer auto-selects this
  kernel on TPU (pipeline/streaming.py).
- BATCH SERVING (scripts/profile_serve_lstm_ablate.py, 2026-08-20,
  after native-dtype gate streaming + VMEM-budgeted block sizing): the
  kernel wins every regime — packed f32 full windows 203.6 -> 160.8 ms
  /120 s (+27%, max dev 0.0 — the scan's per-block XLA dispatch, gates
  repack, and per-step fusion HBM round trips all disappear), packed
  bf16 161.0 -> 124.3 (+30%), fast_serve 109.5 -> 93.3 (+17%),
  fast_serve_src 70.2 -> 62.1 (+13%). ADOPTED: the serving pipeline
  routes the stereo stage to the kernel on TPU at effective batch >= 8
  (restore.py; whole-file batch-1 parity mode keeps the scan — the
  kernel pads batch to 8, which would 8x the gates traffic).
  (The round-3 tie at [60, 88200, 128] — 117 vs 106 ms — was the OLD
  kernel, whose always-f32 staging materialized a second gates copy.)
docs/PERFORMANCE.md "Pallas LSTM" sections hold the tables.
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
        # state lives f32 in scratch; the h @ W_hh matmul runs at the
        # GATES dtype (bf16 on the bf16 serve path — single-pass MXU,
        # matching the scan path's own bf16 recurrence math) with f32
        # accumulation
        h = h_ref[:].astype(whh_ref.dtype)
        g = jnp.dot(h, whh_ref[:], preferred_element_type=jnp.float32)
        g = g + gx_ref[t].astype(jnp.float32)
        i = jax.nn.sigmoid(g[:, :hidden])
        f = jax.nn.sigmoid(g[:, hidden:2 * hidden])
        gg = jnp.tanh(g[:, 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(g[:, 3 * hidden:])
        c = f * c_ref[:] + i * gg
        h = o * jnp.tanh(c)
        c_ref[:] = c
        h_ref[:] = h
        out_ref[t] = h.astype(out_ref.dtype)

        # capture the carry at the TRUE last step: the grid is padded to a
        # block_t multiple, and the padded steps (zero gates) keep advancing
        # (h, c) — the state they produce is NOT the sequence's final state
        @pl.when(base + t == t_true - 1)
        def _capture():
            hf_ref[:] = h
            cf_ref[:] = c

        return 0

    jax.lax.fori_loop(0, block_t, step, 0)


def _auto_block_t(bp: int, g4: int, h_dim: int, itemsize: int,
                  t: int = 0) -> int:
    """Largest block_t in {64, ..., 1} whose VMEM working set fits a ~8 MB
    budget inside the ~16 MB scoped-VMEM limit. Accounted per grid step:
    gates-in + out blocks (x2 — Pallas double-buffers grid blocks), plus
    the resident w_hh / carry-in / scratch state (f32). At the streaming
    shape (bp=16, f32) this picks 64 (the measured +26% config); at the
    bf16 batch-640 serve shape it picks 8 (the measured serve-A/B
    config); at the f32 batch-640 sub-chunked shape it reaches 4 —
    block_t=8 there measured a 16.25 MB
    scoped allocation against the 16 MB limit (bench 2026-08-20), which
    is why the budget prices every buffer, not just the gates.

    When the true step count `t` is given, a block length that DIVIDES t
    is preferred within one halving of the budget-best size: padding t up
    to the block grid materializes a full copy of the gates array
    (measured 0.55 ms per streaming feed at T=22048->22080, 2.2 ms per
    stereo train step at T=44100->44160 — round-5 itemization), while one
    halving only doubles the tiny per-block grid overhead. Beyond one
    halving the extra grid steps cost more than the pad (T=44100's
    largest fitting divisor is 4 — keep 64 and pad)."""
    budget = 8 * 1024 * 1024
    resident = (h_dim * g4 + 6 * bp * h_dim) * 4  # w_hh + h0/c0/hf/cf/scratch
    best = 1
    for bt in (64, 32, 16, 8, 4, 2, 1):
        working = 2 * bt * bp * (g4 + h_dim) * itemsize + resident
        if working <= budget or bt == 1:
            best = bt
            break
    if t:
        for bt in (best, max(1, best // 2)):
            if t % bt == 0:
                return bt
    return best


def lstm_recurrence_pallas(gates_x, w_hh, carry=None, *, block_t: int = 0,
                           time_major: bool = False, interpret: bool = False):
    """Run the LSTM recurrence over precomputed gates.

    gates_x: [B, T, 4H] (x @ W_ih + b already applied), or [T, B, 4H] when
      time_major=True — the projection emits time-major, so passing it
      through directly avoids a pair of cancelling transposes
    w_hh: [H, 4H]
    carry: optional (h0, c0), each [B, H] (zeros when None)
    block_t: grid block length in steps; 0 = auto-size to the VMEM budget
    -> ([B, T, H], (h_f, c_f)) — the state after the final true step

    Dtype contract: gates stream through VMEM at THEIR dtype (bf16 gates =
    half the HBM traffic of the old always-f32 staging, and exactly the
    same values — the f32 upcast of a bf16 gate is lossless) and the output
    is written at the gates dtype (the callers cast to it anyway). The
    (h, c) state is f32 in VMEM scratch and f32 across carry I/O.
    """
    if time_major:
        t, b, g4 = gates_x.shape
    else:
        b, t, g4 = gates_x.shape
    h_dim = g4 // 4
    bp = _round_up(b, 8)
    dtype = gates_x.dtype
    if block_t <= 0:
        block_t = _auto_block_t(bp, g4, h_dim, jnp.dtype(dtype).itemsize,
                                t=t)
    tp = _round_up(t, block_t)

    gx = gates_x if time_major else jnp.transpose(gates_x, (1, 0, 2))
    if bp != b or tp != t:
        gx = jnp.pad(gx, ((0, tp - t), (0, bp - b), (0, 0)))
    w_hh = w_hh.astype(dtype)
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
            jax.ShapeDtypeStruct((tp, bp, h_dim), dtype),
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


# --------------------------------------------------------------- training
# Fused forward+backward recurrence kernels (round 4). The inference
# kernel's custom VJP recomputes the scan forward, so training under it
# pays BOTH forwards — these kernels make the kernel the cheaper path in
# training too: the forward-train variant additionally saves the gate
# activations and cell sequence (the residuals the backward needs), and
# the backward kernel runs the reversed recurrence with the (dh, dc)
# carries and the dW_hh accumulator resident in VMEM — no per-step XLA
# dispatch, no stacked-residual gather traffic beyond one linear read of
# each saved tensor.


def _lstm_train_fwd_kernel(gx_ref, whh_ref, h0_ref, c0_ref,
                           out_ref, hf_ref, cf_ref, acts_ref, cseq_ref,
                           h_ref, c_ref, *, block_t: int, hidden: int,
                           t_true: int):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_ref[:] = h0_ref[:]
        c_ref[:] = c0_ref[:]

    base = pl.program_id(0) * block_t

    def step(t, _):
        h = h_ref[:].astype(whh_ref.dtype)
        g = jnp.dot(h, whh_ref[:], preferred_element_type=jnp.float32)
        g = g + gx_ref[t].astype(jnp.float32)
        i = jax.nn.sigmoid(g[:, :hidden])
        f = jax.nn.sigmoid(g[:, hidden:2 * hidden])
        gg = jnp.tanh(g[:, 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(g[:, 3 * hidden:])
        c = f * c_ref[:] + i * gg
        h_new = o * jnp.tanh(c)
        acts_ref[t] = jnp.concatenate([i, f, gg, o], axis=-1)
        cseq_ref[t] = c
        c_ref[:] = c
        h_ref[:] = h_new
        out_ref[t] = h_new

        @pl.when(base + t == t_true - 1)
        def _capture():
            hf_ref[:] = h_new
            cf_ref[:] = c

        return 0

    jax.lax.fori_loop(0, block_t, step, 0)


def _lstm_train_bwd_kernel(acts_ref, cseq_ref, cprev_ref, hprev_ref,
                           dout_ref, whh_ref, dhf_ref, dcf_ref,
                           dgx_ref, dh0_ref, dc0_ref, dwhh_ref,
                           dh_ref, dc_ref, dw_ref, *, block_t: int,
                           hidden: int, t_true: int, n_blocks: int):
    """Reverse-time backward pass. Grid iteration k processes time block
    n_blocks-1-k (the index_map reverses block order); within a block the
    fori_loop walks steps in reverse. Carries (dh, dc) and the dW_hh
    accumulator live in f32 VMEM scratch across the whole grid."""
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dc_ref[:] = jnp.zeros_like(dc_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)

    # reversed grid: program k holds time block n_blocks-1-k
    base = (n_blocks - 1 - pl.program_id(0)) * block_t

    def step(j, _):
        t = block_t - 1 - j
        is_real = base + t <= t_true - 1

        # at the TRUE final step the output-side carry cotangents enter
        @pl.when(base + t == t_true - 1)
        def _seed():
            dh_ref[:] = dh_ref[:] + dhf_ref[:]
            dc_ref[:] = dc_ref[:] + dcf_ref[:]

        a = acts_ref[t]
        i = a[:, :hidden]
        f = a[:, hidden:2 * hidden]
        gg = a[:, 2 * hidden:3 * hidden]
        o = a[:, 3 * hidden:]
        tc = jnp.tanh(cseq_ref[t])

        dh_total = dout_ref[t] + dh_ref[:]
        do = dh_total * tc
        dct = dh_total * o * (1.0 - tc * tc) + dc_ref[:]
        di = dct * gg
        df = dct * cprev_ref[t]
        dgg = dct * i
        d_lin = jnp.concatenate(
            [di * i * (1.0 - i), df * f * (1.0 - f),
             dgg * (1.0 - gg * gg), do * o * (1.0 - o)], axis=-1)
        d_lin = jnp.where(is_real, d_lin, jnp.zeros_like(d_lin))
        dgx_ref[t] = d_lin

        @pl.when(is_real)
        def _carry():
            # dh_{t-1} = d_lin @ W_hh^T ; dW_hh += h_{t-1}^T d_lin
            dh_ref[:] = jax.lax.dot_general(
                d_lin, whh_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dc_ref[:] = dct * f
            dw_ref[:] = dw_ref[:] + jax.lax.dot_general(
                hprev_ref[t], d_lin, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        return 0

    jax.lax.fori_loop(0, block_t, step, 0)

    @pl.when(pl.program_id(0) == n_blocks - 1)
    def _final():
        dh0_ref[:] = dh_ref[:]
        dc0_ref[:] = dc_ref[:]
        dwhh_ref[:] = dw_ref[:]


def _auto_block_t_train(bp: int, h_dim: int, t: int = 0) -> int:
    """Block sizing for the training kernels (all f32): the backward
    streams 8H-wide inputs + 4H-wide dgx per step, double-buffered.
    Same divide-t-within-one-halving preference as _auto_block_t (the
    2-s stereo T=44100 divides by neither 64 nor 32, so the default
    shape keeps 64 and pays the 2.2 ms pad — other T shapes benefit)."""
    budget = 8 * 1024 * 1024
    resident = (h_dim * 4 * h_dim + 8 * bp * h_dim + 4 * h_dim * h_dim) * 4
    best = 1
    for bt in (64, 32, 16, 8, 4, 2, 1):
        if 2 * bt * bp * 12 * h_dim * 4 + resident <= budget or bt == 1:
            best = bt
            break
    if t:
        for bt in (best, max(1, best // 2)):
            if t % bt == 0:
                return bt
    return best


def lstm_recurrence_pallas_train(gates_x, w_hh, carry=None, *,
                                 block_t: int = 0, time_major: bool = False,
                                 interpret: bool = False):
    """Forward pass that also returns the backward residuals.

    Returns ((out [B,T,H] f32, (h_f, c_f)), residuals) where residuals =
    (acts [T,B,4H], c_seq [T,B,H], h_seq_tm [T,B,H]) — everything
    `lstm_recurrence_pallas_bwd` needs besides the caller-held inputs.
    Gates stream at their own dtype; state/residuals/grads are f32
    (training runs the recurrence at parameter precision)."""
    if time_major:
        t, b, g4 = gates_x.shape
    else:
        b, t, g4 = gates_x.shape
    h_dim = g4 // 4
    bp = _round_up(b, 8)
    if block_t <= 0:
        block_t = _auto_block_t_train(bp, h_dim, t=t)
    tp = _round_up(t, block_t)

    # gates stream at their OWN dtype (bf16 under AMP = half the read
    # traffic and no materialized f32 copy; the in-kernel upcast of a
    # bf16 value is lossless, so the math is identical to the previous
    # eager f32 staging). Everything else — state, residuals, W_hh — is
    # f32: training runs the recurrence at parameter precision.
    gx = gates_x if time_major else jnp.transpose(gates_x, (1, 0, 2))
    if bp != b or tp != t:
        gx = jnp.pad(gx, ((0, tp - t), (0, bp - b), (0, 0)))
    w_hh = w_hh.astype(jnp.float32)
    if carry is None:
        h0 = jnp.zeros((bp, h_dim), jnp.float32)
        c0 = jnp.zeros((bp, h_dim), jnp.float32)
    else:
        h0, c0 = (jnp.pad(s.astype(jnp.float32), ((0, bp - b), (0, 0)))
                  if bp != b else s.astype(jnp.float32) for s in carry)

    kernel = functools.partial(_lstm_train_fwd_kernel, block_t=block_t,
                               hidden=h_dim, t_true=t)
    state_spec = pl.BlockSpec((bp, h_dim), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    tspec = lambda w: pl.BlockSpec((block_t, bp, w), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
    out, hf, cf, acts, cseq = pl.pallas_call(
        kernel,
        grid=(tp // block_t,),
        in_specs=[tspec(g4), pl.BlockSpec(memory_space=pltpu.VMEM),
                  state_spec, state_spec],
        out_specs=[tspec(h_dim), state_spec, state_spec,
                   tspec(g4), tspec(h_dim)],
        out_shape=[
            jax.ShapeDtypeStruct((tp, bp, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((bp, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((bp, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((tp, bp, g4), jnp.float32),
            jax.ShapeDtypeStruct((tp, bp, h_dim), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bp, h_dim), jnp.float32),
            pltpu.VMEM((bp, h_dim), jnp.float32),
        ],
        interpret=interpret,
    )(gx, w_hh, h0, c0)
    res = (acts, cseq, out, h0, c0, t, b, block_t)
    return (jnp.transpose(out[:t, :b], (1, 0, 2)), (hf[:b], cf[:b])), res


def lstm_recurrence_pallas_bwd(res, w_hh, dout, dcarry=None, *,
                               dgx_time_major: bool = False,
                               interpret: bool = False):
    """Backward recurrence. res: from lstm_recurrence_pallas_train.
    dout: [B, T, H] cotangent of the output; dcarry: optional (dhf, dcf).
    Returns (dgates_x, dw_hh, dh0 [B,H], dc0 [B,H]); dgates_x is
    [B,T,4H], or [T,B,4H] with dgx_time_major=True — the custom-VJP
    wrapper's primal gates are time-major, and returning the kernel's
    native layout directly avoids a transpose round trip XLA
    materialized at ~10x roofline (18 ms/step at the stereo train
    shape)."""
    acts, cseq, hseq, h0, c0, t, b, block_t = res
    tp, bp, g4 = acts.shape
    h_dim = g4 // 4
    n_blocks = tp // block_t

    # shifted sequences: step t's backward needs c_{t-1} and h_{t-1}
    cprev = jnp.concatenate([c0[None], cseq[:-1]], axis=0)
    hprev = jnp.concatenate([h0[None], hseq[:-1]], axis=0)
    do_tm = jnp.transpose(dout, (1, 0, 2)).astype(jnp.float32)
    if bp != b or tp != t:
        do_tm = jnp.pad(do_tm, ((0, tp - t), (0, bp - b), (0, 0)))
    if dcarry is None:
        dhf = jnp.zeros((bp, h_dim), jnp.float32)
        dcf = jnp.zeros((bp, h_dim), jnp.float32)
    else:
        dhf, dcf = (jnp.pad(s.astype(jnp.float32), ((0, bp - b), (0, 0)))
                    if bp != b else s.astype(jnp.float32) for s in dcarry)
    w_hh = w_hh.astype(jnp.float32)

    kernel = functools.partial(_lstm_train_bwd_kernel, block_t=block_t,
                               hidden=h_dim, t_true=t, n_blocks=n_blocks)
    state_spec = pl.BlockSpec((bp, h_dim), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    # reversed time order: grid step k gets time block n_blocks-1-k
    rspec = lambda w: pl.BlockSpec(
        (block_t, bp, w), lambda i: (n_blocks - 1 - i, 0, 0),
        memory_space=pltpu.VMEM)
    dgx, dh0, dc0, dwhh = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[rspec(g4), rspec(h_dim), rspec(h_dim), rspec(h_dim),
                  rspec(h_dim), pl.BlockSpec(memory_space=pltpu.VMEM),
                  state_spec, state_spec],
        out_specs=[rspec(g4), state_spec, state_spec,
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((tp, bp, g4), jnp.float32),
            jax.ShapeDtypeStruct((bp, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((bp, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((h_dim, g4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bp, h_dim), jnp.float32),
            pltpu.VMEM((bp, h_dim), jnp.float32),
            pltpu.VMEM((h_dim, g4), jnp.float32),
        ],
        interpret=interpret,
    )(acts, cseq, cprev, hprev, do_tm, w_hh, dhf, dcf)
    dgx = dgx[:t, :b]
    if not dgx_time_major:
        dgx = jnp.transpose(dgx, (1, 0, 2))
    return dgx, dwhh, dh0[:b], dc0[:b]

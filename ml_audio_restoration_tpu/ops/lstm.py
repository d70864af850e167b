"""Unidirectional LSTM as an XLA scan with a Pallas TPU fast path.

The reference's StereoSeparator uses a cuDNN LSTM
(/root/reference/src/models/stereo_separator.py:37-43,107) whose sequence
length limits force 2-second chunks everywhere. The TPU-native formulation:

1. hoist the input projection out of the recurrence — one large
   [B*T, C] @ [C, 4H] matmul that runs on the MXU at full tilt;
2. run the recurrence either as `lax.scan` (CPU / autodiff path) or as a
   fused Pallas kernel (ops/pallas/lstm.py) that keeps W_hh and the carry
   VMEM-resident and streams the precomputed gates block-wise.

The Pallas path carries a custom VJP whose backward differentiates the scan
formulation (recompute-and-vjp), so `impl='auto'` is safe under jax.grad —
inference takes the kernel, training gradients take the scan.

Weight layout matches torch.nn.LSTM gate order (i, f, g, o) so reference
checkpoints convert directly.
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


def lstm_recurrence_scan(gates_x, w_hh, *, unroll: int = 8, carry=None,
                         return_carry: bool = False,
                         time_major: bool = False):
    """Reference recurrence: gates_x [B, T, 4H] (or [T, B, 4H] when
    time_major), w_hh [H, 4H] -> [B, T, H].

    `carry`: optional ((h, c)) initial state — the streaming path threads the
    final state of one block into the next (exact state continuity the
    reference's per-chunk cuDNN calls cannot provide).

    Layout note (profiled): the scan iterates/stacks on axis 0, so its
    natural I/O is time-major. Feeding batch-major gates costs a
    materialized [B,T,4H]->[T,B,4H] transpose (~11 ms per 120 s serve
    call), and the batch-major output transpose was being FUSED INTO BOTH
    stereo decoders by XLA (2 x 9.5 ms for the same relayout). The gates
    now arrive time-major straight out of the projection matmul, and the
    output transpose is materialized exactly once behind an
    optimization_barrier.
    """
    gates_tm = gates_x if time_major else gates_x.swapaxes(0, 1)
    b = gates_tm.shape[1]
    h_dim = gates_tm.shape[2] // 4

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

    init = carry if carry is not None else (
        jnp.zeros((b, h_dim), gates_tm.dtype),
        jnp.zeros((b, h_dim), gates_tm.dtype),
    )
    final, ys = lax.scan(step, init, gates_tm, unroll=unroll)
    ys = lax.optimization_barrier(ys.swapaxes(0, 1))
    return (ys, final) if return_carry else ys


@jax.custom_vjp
def lstm_recurrence_fast(gates_tm, w_hh, h0, c0):
    """Pallas forward (with carry I/O); scan-derived backward.

    Takes TIME-MAJOR gates [T, B, 4H] — the projection's natural output —
    so the kernel consumes them without a transpose pair."""
    from .pallas.lstm import lstm_recurrence_pallas

    out, (hf, cf) = lstm_recurrence_pallas(gates_tm, w_hh, (h0, c0),
                                           time_major=True)
    return out, hf, cf


def _fast_fwd(gates_tm, w_hh, h0, c0):
    return (lstm_recurrence_fast(gates_tm, w_hh, h0, c0),
            (gates_tm, w_hh, h0, c0))


def _fast_bwd(residuals, g):
    gates_tm, w_hh, h0, c0 = residuals

    def f(gx, w, h, c):
        # f32 carries (the Pallas primal's state dtype) so a bf16 caller's
        # recompute matches the kernel's internal precision
        out, (hf, cf) = lstm_recurrence_scan(
            gx, w, carry=(h.astype(jnp.float32), c.astype(jnp.float32)),
            return_carry=True, time_major=True)
        # match the primal's dtype contract (out at the gates dtype,
        # carries f32 — ops/pallas/lstm.py) so jax.vjp accepts the
        # primal's cotangents under bf16 compute; without the casts any
        # grad through a bf16 impl='pallas' LSTM fails with a cotangent
        # dtype ValueError
        return out.astype(gx.dtype), hf.astype(jnp.float32), \
            cf.astype(jnp.float32)

    _, vjp = jax.vjp(f, gates_tm, w_hh, h0, c0)
    return vjp(g)


lstm_recurrence_fast.defvjp(_fast_fwd, _fast_bwd)


@jax.custom_vjp
def lstm_recurrence_train(gates_tm, w_hh, h0, c0):
    """Training recurrence: Pallas forward AND Pallas backward (round 4).

    Unlike lstm_recurrence_fast (whose backward recomputes the scan
    forward — fine for inference, double-pay under grad), this pairs the
    forward-train kernel (which saves the gate activations + cell
    sequence as residuals) with a fused reverse-time backward kernel
    that keeps the (dh, dc) carries and the dW_hh accumulator in VMEM
    (ops/pallas/lstm.py). All-f32. Takes TIME-MAJOR gates [T, B, 4H]."""
    from .pallas.lstm import lstm_recurrence_pallas_train

    (out, (hf, cf)), _ = lstm_recurrence_pallas_train(
        gates_tm, w_hh, (h0, c0), time_major=True)
    return out, hf, cf


def _train_fwd(gates_tm, w_hh, h0, c0):
    from .pallas.lstm import lstm_recurrence_pallas_train

    (out, (hf, cf)), res = lstm_recurrence_pallas_train(
        gates_tm, w_hh, (h0, c0), time_major=True)
    return (out, hf, cf), (res, w_hh)


def _train_bwd(residuals, g):
    from .pallas.lstm import lstm_recurrence_pallas_bwd

    res, w_hh = residuals
    dout, dhf, dcf = g
    dgx_tm, dwhh, dh0, dc0 = lstm_recurrence_pallas_bwd(
        res, w_hh, dout, (dhf, dcf), dgx_time_major=True)
    # gates cotangent in the kernel's native TIME-MAJOR layout (= the
    # primal's). It stays f32 even for bf16 primal gates (a dtype can't
    # ride in custom_vjp residuals, and the f32 cotangent flows into the
    # projection VJP at higher precision — JAX accepts the widening;
    # exercised by the bf16 AMP train A/B)
    return dgx_tm, dwhh.astype(w_hh.dtype), dh0, dc0


lstm_recurrence_train.defvjp(_train_fwd, _train_bwd)


# 'auto' resolves here. The scan is the safe default (CPU-runnable,
# reference-exact). Production paths pass an impl explicitly on TPU:
# 'pallas' for inference (wins every measured serve regime, +13–30%
# device, scripts/profile_serve_lstm_ablate.py; streaming +26%) and
# 'pallas_train' for the stereo train step (fused forward+backward VJP,
# 285 -> 124 ms/step, scripts/profile_train_lstm_ablate.py). Plain
# 'pallas' must NOT be used under grad — its VJP recomputes the scan
# forward, paying both. Ablation scripts flip this default to re-run
# the A/Bs without threading an impl kwarg through every layer.
_DEFAULT_IMPL = "scan"


def set_default_impl(impl: str) -> str:
    """Set what impl='auto' resolves to ('scan' | 'pallas'); returns the
    previous value. Ablation hook (scripts/profile_streaming_ablate.py) —
    production code leaves this alone."""
    global _DEFAULT_IMPL
    if impl not in ("scan", "pallas", "pallas_train"):
        raise ValueError(
            f"impl must be scan|pallas|pallas_train, got {impl!r}")
    prev, _DEFAULT_IMPL = _DEFAULT_IMPL, impl
    return prev


def lstm(x, params, *, unroll: int = 8, impl: str = "auto", carry=None,
         return_carry: bool = False):
    """Run a single-layer unidirectional LSTM over [B, T, C] -> [B, T, H].

    Initial hidden/cell state is zero (the reference passes no state across
    chunks — stereo_separator.py:107) unless `carry` supplies one.

    impl: 'auto', 'pallas', 'scan'. Measured on v5e (round 4, after the
    kernel gained native-dtype gate streaming + VMEM-budgeted blocks):
    the kernel wins EVERY serve regime — full-window f32 +27%
    bit-identical, full-window bf16 +30%, sub-chunked bf16 presets
    +13–17% (scripts/profile_serve_lstm_ablate.py) — and streaming
    +26%. The serving pipeline and StreamingRestorer select it
    explicitly on TPU. 'pallas_train' is the TRAINING variant (fused
    forward+backward VJP — exact scan gradients, 2.3× the stereo train
    step; the Trainer selects it on TPU); plain 'pallas' under grad
    would recompute the scan forward and pay both. 'auto' stays the
    scan (CPU backends, reference-exact formulation).
    """
    bias = params["b_ih"] + params["b_hh"]
    # Input projection for the whole sequence: one MXU-sized matmul, emitted
    # TIME-MAJOR so the scan consumes it directly (the batch-major form
    # forced a materialized transpose — see lstm_recurrence_scan). The
    # lowering looks alarming in traces (a degenerate window-T convolution
    # at the fast_serve shape) but is at HBM roofline: the explicit
    # matmul+transpose form was measured bit-identical AND equal end-to-end
    # (fast_serve 109.6 vs 109.3 ms; 2026-08-18 — docs/PERFORMANCE.md
    # "negative results"), so the simpler fused einsum stays.
    gates_tm = jnp.einsum(
        "btc,ch->tbh", x, params["w_ih"], preferred_element_type=x.dtype
    ) + bias
    w_hh = params["w_hh"]

    if impl not in ("auto", "pallas", "pallas_train", "scan"):
        raise ValueError(
            f"impl must be auto|pallas|pallas_train|scan, got {impl!r}")
    if impl == "auto":
        impl = _DEFAULT_IMPL
    if impl in ("pallas", "pallas_train"):
        b = x.shape[0]
        h_dim = w_hh.shape[0]
        h0, c0 = carry if carry is not None else (
            jnp.zeros((b, h_dim), x.dtype), jnp.zeros((b, h_dim), x.dtype))
        fast = (lstm_recurrence_train if impl == "pallas_train"
                else lstm_recurrence_fast)
        out, hf, cf = fast(
            gates_tm, w_hh,
            h0.astype(jnp.float32), c0.astype(jnp.float32))
        out = out.astype(x.dtype)
        if return_carry:
            return out, (hf.astype(x.dtype), cf.astype(x.dtype))
        return out
    return lstm_recurrence_scan(gates_tm, w_hh, unroll=unroll, carry=carry,
                                return_carry=return_carry, time_major=True)


def stacked_lstm(x, layers, *, carries=None, return_carries: bool = False,
                 **kwargs):
    """Multi-layer unidirectional LSTM (torch num_layers>1): each layer's
    output feeds the next. `layers`: list of per-layer param dicts;
    `carries`: optional list of per-layer (h, c) states."""
    new_carries = []
    for i, params in enumerate(layers):
        carry = carries[i] if carries is not None else None
        if return_carries:
            x, c = lstm(x, params, carry=carry, return_carry=True, **kwargs)
            new_carries.append(c)
        else:
            x = lstm(x, params, carry=carry, **kwargs)
    return (x, new_carries) if return_carries else x

"""Packed ("space-to-depth") 1-D convolutions: fold r time steps into
channels so small-channel conv stacks fill the TPU's 128-wide lane tiles.

Why: XLA pads the minor (channel) axis of NWC conv activations to 128 lanes,
so a C=32 tensor moves 4x its bytes through HBM ("Extra memory due to
padding: 4.0x" in OOM dumps) — and serving is HBM-bound
(docs/PERFORMANCE.md). Folding r=4 samples into channels gives dense
128-lane tiles; a k-tap conv becomes a few-tap conv over 128-wide
block-Toeplitz kernels. Measured on the probe: C=32 r=4 stacks run 1.6x
faster (scripts/pack_conv_probe.py).

Representation ("r-packed", zero shift):

    P_r(x)[n, t, phase*C + c] = x[n, r*t + phase, c]      phase in [0, r)

i.e. pack() is a pure reshape of [B, T, C] (right-padded to a multiple of
r). The key exactness property: when the packed tensor is zero-padded at
the packed level, those zeros coincide with the plain conv's out-of-range
zeros, so a packed 'same' conv equals the plain 'same' conv EXACTLY at
every valid position — no boundary fix-up — as long as invalid tail phases
(only present when T % r != 0) are kept at zero (mask_tail).

Index algebra (derivations verified exhaustively by tests/test_packed.py):

  conv (stride 1, dilation d, torch 'same' padding p):
      out[u] = sum_j w[j] * x[u + j*d - p]
      packed: out_p[t', a] = sum_{m,b} Wp[m, b*Cin+ci, a*Cout+co] * xp[t'+m-lo, b*Cin+ci]
      with j*d = r*(m - lo) + b - a + p   (one j per (m, b, a) slot)

  transpose conv (stride s, torch semantics u = s*v + j - p), with possibly
  different input/output packing rates r_in, r_out:
      j = r_out*Delta + a - s*b + p,   packed lhs_dilation = s*r_in / r_out
      (Delta = packed tap offset). When s*r_in == r_out this degenerates to
      a plain stride-1 packed conv — e.g. the U-Net's k2/s2 up-convs from an
      r=2-packed input to an r=4-packed output become ONE pointwise
      128->128 matmul.

The packed kernels are built inside jit from the plain parameters via a
static gather (index maps cached per (k, r, p, d)), so checkpoints and the
training path are untouched; weight packing costs a few tiny HLOs per
compiled program.

No reference counterpart: /root/reference runs NCW torch convs on GPU
(src/models/denoiser.py:88) where cuDNN handles small channel counts; the
lane-padding economics are TPU-specific.
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NWC", "WIO", "NWC")


# ------------------------------------------------------------ pack / unpack
def pack(x, r: int):
    """[B, T, C] -> [B, ceil(T/r), r*C] (right zero-pad to a multiple of r).

    Pure reshape when T % r == 0. Invalid tail phases (T % r != 0) are zero,
    which mask_tail maintains across nonlinear packed layers."""
    b, t, c = x.shape
    tp = -(-t // r)
    if tp * r != t:
        x = jnp.pad(x, ((0, 0), (0, tp * r - t), (0, 0)))
    return x.reshape(b, tp, r * c)


def unpack(xp, r: int, c: int, t: int | None = None):
    """[B, Tp, r*C] -> [B, Tp*r (sliced to t), C]. Pure reshape (+slice)."""
    b, tp, rc = xp.shape
    assert rc == r * c, (rc, r, c)
    if t is not None:  # catch caller bookkeeping bugs (wrong r) here, not
        assert t <= tp * r, (t, tp, r)  # as a later silent short tensor
    x = xp.reshape(b, tp * r, c)
    return x if t is None or t == tp * r else x[:, :t, :]


def repack_halve(xp, r: int, c: int):
    """r-packed -> (r/2)-packed at the same sample coverage: [B, Tp, r*C] ->
    [B, 2*Tp, (r/2)*C]. Pure reshape (phase-major blocks split in half)."""
    b, tp, rc = xp.shape
    assert rc == r * c and r % 2 == 0
    return xp.reshape(b, tp * 2, (r // 2) * c)


def mask_tail(xp, r: int, c: int, t: int):
    """Zero the invalid tail phases (sample index >= t). No-op when the
    packing covers exactly t samples. The mask is built from iotas, so XLA
    fuses it into the producing conv's epilogue — no extra HBM pass."""
    b, tp, rc = xp.shape
    if tp * r == t:
        return xp
    step = lax.broadcasted_iota(jnp.int32, (tp, rc), 0)
    phase = lax.broadcasted_iota(jnp.int32, (tp, rc), 1) // c
    return jnp.where(step * r + phase < t, xp, jnp.zeros((), xp.dtype))


# ------------------------------------------------------------- kernel maps
@functools.lru_cache(maxsize=None)
def _conv_index_map(k: int, r: int, padding: int, dilation: int):
    """Static (m, b, a) -> j map for a stride-1 'same' conv at packing r.

    Returns (jmap [kp, r, r] int32 with k as the zero slot, (lo, hi) packed
    conv padding)."""
    entries = []  # (delta, b, a, j)
    for j in range(k):
        for a in range(r):
            num = j * dilation - padding + a  # = r*delta + b
            b = num % r
            entries.append(((num - b) // r, b, a, j))
    deltas = [e[0] for e in entries]
    lo, hi = -min(deltas), max(deltas)
    kp = lo + hi + 1
    jmap = np.full((kp, r, r), k, np.int32)
    for delta, b, a, j in entries:
        slot = jmap[delta + lo, b, a]
        assert slot == k, "duplicate packed-kernel slot"
        jmap[delta + lo, b, a] = j
    return jmap, (lo, hi)


@functools.lru_cache(maxsize=None)
def _transpose_index_map(k: int, r_in: int, r_out: int, stride: int,
                         padding: int, dilation: int = 1):
    """Static (m, b, a) -> j map for a transpose conv between packing rates.

    j*dilation = r_out*Delta + a - stride*b + padding; multiple (Delta, b)
    entries per (j, a) are correct — the packed-level stride parity selects
    exactly one at each output position (requires the stride*r_in/r_out
    divisibility below)."""
    dil, rem = divmod(stride * r_in, r_out)
    assert rem == 0 and dil >= 1, (
        f"unsupported packing: stride {stride} r_in {r_in} r_out {r_out}")
    entries = []
    for j in range(k):
        for a in range(r_out):
            for b in range(r_in):
                num = stride * b + j * dilation - a - padding
                if num % r_out == 0:
                    entries.append((num // r_out, b, a, j))
    deltas = [e[0] for e in entries]
    lo, hi = -min(deltas), max(deltas)
    kp = lo + hi + 1
    jmap = np.full((kp, r_in, r_out), k, np.int32)
    for delta, b, a, j in entries:
        slot = jmap[delta + lo, b, a]
        assert slot == k, "duplicate packed-transpose slot"
        jmap[delta + lo, b, a] = j
    return jmap, lo, dil


@functools.lru_cache(maxsize=None)
def _conv_raise_index_map(k: int, r_in: int, r_out: int, padding: int,
                          dilation: int):
    """Static map for a stride-1 plain conv whose OUTPUT is packed at a
    HIGHER rate than its input (r_out = s*r_in): a packed-level conv with
    window stride s. j*dilation = r_in*Delta + b - a + padding over output
    phases a in [0, r_out)."""
    s, rem = divmod(r_out, r_in)
    assert rem == 0 and s >= 1, (r_in, r_out)
    entries = []
    for j in range(k):
        for a in range(r_out):
            num = j * dilation + a - padding
            b = num % r_in
            entries.append(((num - b) // r_in, b, a, j))
    deltas = [e[0] for e in entries]
    lo, hi = -min(deltas), max(deltas)
    kp = lo + hi + 1
    jmap = np.full((kp, r_in, r_out), k, np.int32)
    for delta, b, a, j in entries:
        assert jmap[delta + lo, b, a] == k, "duplicate packed-raise slot"
        jmap[delta + lo, b, a] = j
    return jmap, lo, s


def _gather_kernel(w, jmap):
    """w [k, cin, cout] + jmap [kp, bi, ao] -> packed [kp, bi*cin, ao*cout]."""
    k, cin, cout = w.shape
    kp, bi, ao = jmap.shape
    w_ext = jnp.concatenate([w, jnp.zeros((1, cin, cout), w.dtype)])
    wp = w_ext[jnp.asarray(jmap.reshape(-1))].reshape(kp, bi, ao, cin, cout)
    # packed channel order is phase-major: (b, cin) rows, (a, cout) cols
    return wp.transpose(0, 1, 3, 2, 4).reshape(kp, bi * cin, ao * cout)


# ------------------------------------------------------------ packed ops
def _plain_exec(xp, wp, bias, *, window_strides, padding, lhs_dilation=None,
                groups: int = 1):
    """Default conv executor. The `_exec` hook on the packed ops lets the
    int8 serving path (ops/quant.py::int8_exec) swap in an s8 x s8 -> s32
    conv with a dequant epilogue while reusing every packed-kernel
    construction above unchanged."""
    out = lax.conv_general_dilated(xp, wp, window_strides, padding,
                                   lhs_dilation=lhs_dilation,
                                   dimension_numbers=_DIMNUMS,
                                   feature_group_count=groups)
    if bias is not None:
        out = out + bias
    return out


def _group_kernels(w, b, jmap, r_out: int, shared_input: bool,
                   flip: bool = False):
    """Normalize the (w, b) arguments of the packed ops for grouped convs.

    `w` may be a single plain kernel [k, Cin, Cout] or a tuple of G kernels
    of identical shape (one per group, e.g. the stereo L/R decoders —
    models/stereo_separator.py). Returns (wp, bias, groups) where wp is the
    per-group packed kernels concatenated along the output axis (GROUP-major
    packed channel layout: [g0's r*Cout | g1's ... ]), matching
    feature_group_count=G convs whose grouped input uses the same layout.
    `shared_input=True` means every group convolves the SAME input tensor
    (fgc=1, kernels concatenated along O) — the entry layer of a grouped
    stack, which then reads its shared input from HBM once instead of G
    times."""
    ws = w if isinstance(w, (list, tuple)) else (w,)
    bs = b if isinstance(b, (list, tuple)) else (b,) * len(ws)
    assert len(bs) == len(ws)
    parts = [_gather_kernel(wg, jmap) for wg in ws]
    if flip:
        parts = [p[::-1] for p in parts]
    wp = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=2)
    if all(bg is None for bg in bs):
        bias = None
    else:
        tiles = [jnp.zeros(r_out * ws[0].shape[2], wp.dtype)
                 if bg is None else jnp.tile(bg, r_out) for bg in bs]
        bias = tiles[0] if len(tiles) == 1 else jnp.concatenate(tiles)
    groups = 1 if (shared_input or len(ws) == 1) else len(ws)
    return wp, bias, groups


def packed_conv(xp, w, b=None, *, r: int, padding: int, dilation: int = 1,
                shared_input: bool = False, _exec=None):
    """Stride-1 'same' conv on an r-packed tensor, equal to
    conv1d(unpack(xp), w, b, padding=padding, dilation=dilation) at every
    valid sample (exactly — see module docstring).

    xp: [B, Tp, r*Cin]; w: [k, Cin, Cout] (plain WIO); -> [B, Tp, r*Cout].
    `w`/`b` may be tuples of G per-group kernels/biases (feature_group_count
    conv over a group-major packed input — see _group_kernels).
    """
    w0 = w[0] if isinstance(w, (list, tuple)) else w
    jmap, (lo, hi) = _conv_index_map(int(w0.shape[0]), r, padding, dilation)
    wp, bias, groups = _group_kernels(w, b, jmap, r, shared_input)
    return (_exec or _plain_exec)(
        xp, wp, bias, window_strides=(1,), padding=[(lo, hi)],
        groups=groups)


def packed_conv_transpose(xp, w, b=None, *, r_in: int, r_out: int,
                          stride: int, padding: int, t_in: int,
                          dilation: int = 1, _exec=None):
    """ConvTranspose1d on packed tensors, possibly changing the packing rate.

    Equal to conv_transpose1d(unpack(xp), w, b, stride=stride,
    padding=padding) packed at r_out. `t_in` is the plain input length
    (needed to trim the packed output to the exact plain output length
    (t_in-1)*stride - 2*padding + dilation*(k-1) + 1). Requires
    t_in % r_in == 0 and the plain output length % r_out == 0.
    """
    w0 = w[0] if isinstance(w, (list, tuple)) else w
    k, cin, cout = w0.shape
    assert t_in % r_in == 0, (t_in, r_in)
    t_out = (t_in - 1) * stride - 2 * padding + dilation * (k - 1) + 1
    assert t_out % r_out == 0, (t_out, r_out)
    jmap, lo, dil = _transpose_index_map(int(k), r_in, r_out, stride,
                                         padding, dilation)
    wp, bias, groups = _group_kernels(w, b, jmap, r_out, False, flip=True)
    kp = wp.shape[0]
    tp_in = t_in // r_in
    # out_p[t'] = sum_m Wp[m] xp[v'], t' = dil*v' + m - lo  ->  flipped
    # kernel + lhs_dilation with padding (kp-1-lo, kp-1-p_hi), where p_hi
    # trims the packed output to exactly t_out/r_out steps
    p_hi = dil * (tp_in - 1) + kp - lo - t_out // r_out
    return (_exec or _plain_exec)(
        xp, wp, bias,
        window_strides=(1,), padding=[(kp - 1 - lo, kp - 1 - p_hi)],
        lhs_dilation=(dil,), groups=groups)


def packed_conv_r(xp, w, b=None, *, r_in: int, r_out: int, padding: int,
                  dilation: int = 1, t_in: int, shared_input: bool = False,
                  _exec=None):
    """Stride-1 'same' plain-conv semantics between ANY two packing rates
    (one dividing the other, r=1 meaning the plain layout itself).

    This is the boundary-fusion primitive: a conv at a packing boundary
    absorbs the rate change, so no standalone pack/unpack reshape — which
    XLA materializes as a full relayout copy at C>=64 (measured 4-11 ms per
    boundary on the serve path) — ever exists. r_in < r_out enters packed
    space (packed-level window-stride conv); r_in > r_out exits it (the
    conv re-expressed as its transpose with a flipped kernel:
    conv(w, p, d) == conv_transpose(flip(w), stride=1, p'=(k-1)*d-p, d)).
    """
    if r_in == r_out:
        return packed_conv(xp, w, b, r=r_in, padding=padding,
                           dilation=dilation, shared_input=shared_input,
                           _exec=_exec)
    w0 = w[0] if isinstance(w, (list, tuple)) else w
    k = int(w0.shape[0])
    if r_in > r_out:
        # the transpose path has no shared_input plumbing; a silent drop
        # would trace a grouped conv against an ungrouped input
        assert not shared_input, "shared_input unsupported on r_in > r_out"
        wf = (tuple(wg[::-1] for wg in w)
              if isinstance(w, (list, tuple)) else w[::-1])
        return packed_conv_transpose(
            xp, wf, b, r_in=r_in, r_out=r_out, stride=1,
            padding=(k - 1) * dilation - padding, dilation=dilation,
            t_in=t_in, _exec=_exec)
    assert t_in % r_out == 0, (t_in, r_out)
    jmap, lo, s = _conv_raise_index_map(k, r_in, r_out, padding, dilation)
    wp, bias, groups = _group_kernels(w, b, jmap, r_out, shared_input)
    kp = wp.shape[0]
    return (_exec or _plain_exec)(
        xp, wp, bias, window_strides=(s,), padding=[(lo, kp - s - lo)],
        groups=groups)


def packed_max_pool2(xp, c: int):
    """torch MaxPool1d(2) on an r-packed tensor: halves the packing rate at
    the same packed step count — [B, Tp, r*C] -> [B, Tp, (r/2)*C] — so the
    pool is a pure reshape + pairwise max (no reduce_window, no relayout).
    Caller handles floor-mode semantics for odd valid lengths via its own
    valid-count bookkeeping (the extra straddling element lands in an
    invalid phase)."""
    b, tp, rc = xp.shape
    r = rc // c
    assert r % 2 == 0 and r * c == rc
    y = xp.reshape(b, tp, r // 2, 2, c)
    return jnp.max(y, axis=3).reshape(b, tp, (r // 2) * c)

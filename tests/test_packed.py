"""Exactness tests for the packed (space-to-depth) conv calculus.

Every packed op must equal its plain counterpart at every valid sample —
the pipeline's parity bar rides on this (ops/packed.py module docstring).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ml_audio_restoration_tpu.ops import conv1d, conv_transpose1d, max_pool1d
from ml_audio_restoration_tpu.ops.packed import (
    pack,
    unpack,
    repack_halve,
    mask_tail,
    packed_conv,
    packed_conv_transpose,
    packed_max_pool2,
)


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


# (k, padding, dilation) covering every conv the models use:
# k3/p1 U-Net blocks, k7/p3 stems+decoders, k5/p2 HF, k1/p0 pointwise,
# dilated k3 blocks (d=1,2,4,8), k3 asymmetric-ish check via d=2
CONV_CASES = [
    (3, 1, 1), (7, 3, 1), (5, 2, 1), (1, 0, 1),
    (3, 1, 1), (3, 2, 2), (3, 4, 4), (3, 8, 8),
]


@pytest.mark.parametrize("k,p,d", CONV_CASES)
@pytest.mark.parametrize("r", [2, 4, 8])
def test_packed_conv_matches_plain(k, p, d, r):
    rng = np.random.default_rng(0)
    cin, cout, t = 3, 5, 4 * 8 * 3  # divisible by every r
    x = _rand(rng, 2, t, cin)
    w = _rand(rng, k, cin, cout) * 0.3
    b = _rand(rng, cout)
    want = conv1d(x, w, b, padding=p, dilation=d)
    got = unpack(packed_conv(pack(x, r), w, b, r=r, padding=p, dilation=d),
                 r, cout, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-5)


@pytest.mark.parametrize("r", [2, 4])
def test_packed_conv_tail_mask(r):
    """T % r != 0: pad + mask_tail after each layer keeps a 2-layer relu
    chain exact (the garbage tail would otherwise bleed into valid samples
    through the second conv)."""
    rng = np.random.default_rng(1)
    cin = cout = 4
    t = 41  # not divisible by 2 or 4
    x = _rand(rng, 2, t, cin)
    w1 = _rand(rng, 3, cin, cout) * 0.3
    w2 = _rand(rng, 3, cout, cout) * 0.3
    b1, b2 = _rand(rng, cout), _rand(rng, cout)

    h = jax.nn.relu(conv1d(x, w1, b1, padding=1))
    want = conv1d(h, w2, b2, padding=1)

    hp = jax.nn.relu(packed_conv(pack(x, r), w1, b1, r=r, padding=1))
    hp = mask_tail(hp, r, cout, t)
    got = unpack(packed_conv(hp, w2, b2, r=r, padding=1), r, cout, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-5)


# (k, stride, padding, r_in, r_out): the U-Net k2/s2 ups (r2->r4, r1->r2),
# the SR k4/s2/p1 upsample (r4->r8 stride-1 form and r4->r4 dilated form),
# and the linear-interp kernel form (k4/s2/p1, C=1)
TRANS_CASES = [
    (2, 2, 0, 2, 4), (2, 2, 0, 1, 2), (2, 2, 0, 4, 8),
    (4, 2, 1, 4, 8), (4, 2, 1, 4, 4), (4, 2, 1, 2, 4), (4, 2, 1, 1, 2),
]


@pytest.mark.parametrize("k,s,p,r_in,r_out", TRANS_CASES)
def test_packed_conv_transpose_matches_plain(k, s, p, r_in, r_out):
    rng = np.random.default_rng(2)
    cin, cout = 3, 5
    t = 8 * 6  # divisible by every r_in; outputs divisible by every r_out
    x = _rand(rng, 2, t, cin)
    w = _rand(rng, k, cin, cout) * 0.3
    b = _rand(rng, cout)
    want = conv_transpose1d(x, w, b, stride=s, padding=p)
    t_out = (t - 1) * s - 2 * p + k
    got = unpack(
        packed_conv_transpose(pack(x, r_in), w, b, r_in=r_in, r_out=r_out,
                              stride=s, padding=p, t_in=t),
        r_out, cout, t_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-5)


@pytest.mark.parametrize("r", [2, 4, 8])
def test_packed_max_pool(r):
    rng = np.random.default_rng(3)
    c, t = 5, 8 * 6
    x = _rand(rng, 2, t, c)
    want = max_pool1d(x)
    got = unpack(packed_max_pool2(pack(x, r), c), r // 2, c, t // 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_repack_halve_roundtrip():
    rng = np.random.default_rng(4)
    x = _rand(rng, 2, 48, 3)
    xp8 = pack(x, 8)
    xp4 = repack_halve(xp8, 8, 3)
    np.testing.assert_array_equal(np.asarray(xp4), np.asarray(pack(x, 4)))
    xp2 = repack_halve(xp4, 4, 3)
    np.testing.assert_array_equal(np.asarray(xp2), np.asarray(pack(x, 2)))


def test_multilayer_chain_exact_at_boundaries():
    """8-layer relu chain: packed == plain INCLUDING the first/last samples
    (the zero-shift packing's padded steps coincide with plain zero pads;
    this is the property the probe's shifted form lacked)."""
    rng = np.random.default_rng(5)
    c, t, k, p = 4, 64, 3, 1
    x = _rand(rng, 1, t, c)
    ws = [_rand(rng, k, c, c) * (0.5 / np.sqrt(k * c)) for _ in range(8)]

    h = x
    for w in ws:
        h = jax.nn.relu(conv1d(h, w, padding=p))
    want = np.asarray(h)

    hp = pack(x, 4)
    for w in ws:
        hp = jax.nn.relu(packed_conv(hp, w, r=4, padding=p))
    got = np.asarray(unpack(hp, 4, c, t))
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)


# ----------------------------------------------------- model packed paths
def test_denoiser_apply_packed_matches_apply():
    from ml_audio_restoration_tpu.models import denoiser

    params, state = denoiser.init(jax.random.PRNGKey(0))
    # make BN stats non-trivial so folding is actually exercised
    state = jax.tree_util.tree_map(
        lambda a: a + 0.05 * np.random.default_rng(7).normal(size=a.shape)
        .astype(np.float32) ** 2, state)
    rng = np.random.default_rng(6)
    for t in (4096, 44100):  # t % 8 == 0 and t % 8 == 4 (odd middle levels)
        x = _rand(rng, 2, t, 1) * 0.3
        want, _ = denoiser.apply(params, state, x)
        got = denoiser.apply_packed(params, state, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-6, rtol=1e-4)


@pytest.mark.parametrize("upscale", [2, 4])
def test_super_resolution_apply_packed_matches_apply(upscale):
    from ml_audio_restoration_tpu.models import super_resolution as sr

    params, state = sr.init(jax.random.PRNGKey(1), upscale_factor=upscale)
    rng = np.random.default_rng(8)
    t = 4100  # % 4 == 0, not a power of two
    x = _rand(rng, 2, t, 1) * 0.3
    want, _ = sr.apply(params, state, x)
    got = sr.apply_packed(params, state, x)
    assert got.shape == (2, upscale * t, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-6, rtol=1e-4)


def test_stereo_apply_packed_matches_apply():
    from ml_audio_restoration_tpu.models import stereo_separator as st

    params, state = st.init(jax.random.PRNGKey(2))
    rng = np.random.default_rng(9)
    for t in (2048, 4100):  # pow2 and non-pow2 (both % 4 == 0)
        x = _rand(rng, 2, t, 1) * 0.3
        want, _ = st.apply(params, state, x)
        got = st.apply_packed(params, state, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-6, rtol=1e-4)


# ------------------------------------------------ rate-change (fused) convs
RATE_CASES = [
    # (k, p, d, r_in, r_out) — raising (enter packed) and lowering (exit)
    (7, 3, 1, 1, 4), (3, 1, 1, 1, 2), (7, 3, 1, 1, 8),
    (3, 1, 1, 2, 4), (5, 2, 1, 4, 8),
    (7, 3, 1, 4, 1), (3, 1, 1, 2, 1), (7, 3, 1, 8, 1),
    (3, 1, 1, 4, 2), (7, 3, 1, 8, 4),
    (3, 2, 2, 4, 1), (3, 4, 4, 4, 1), (3, 2, 2, 1, 4),  # dilated exits/entries
    (1, 0, 1, 4, 1), (1, 0, 1, 1, 4),
]


@pytest.mark.parametrize("k,p,d,r_in,r_out", RATE_CASES)
def test_packed_conv_r_matches_plain(k, p, d, r_in, r_out):
    """Boundary-fused rate-change convs (packed_conv_r) == plain conv1d at
    every sample, both directions, including dilation."""
    from ml_audio_restoration_tpu.ops.packed import packed_conv_r

    rng = np.random.default_rng(10)
    cin, cout, t = 3, 5, 8 * 12
    x = _rand(rng, 2, t, cin)
    w = _rand(rng, k, cin, cout) * 0.3
    b = _rand(rng, cout)
    want = conv1d(x, w, b, padding=p, dilation=d)
    got = unpack(
        packed_conv_r(pack(x, r_in), w, b, r_in=r_in, r_out=r_out,
                      padding=p, dilation=d, t_in=t),
        r_out, cout, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-5)


# ------------------------------------------------------ grouped packed convs
def test_conv1d_groups_matches_per_group():
    """conv1d(groups=G) == per-group conv1d stitched along channels
    (torch.nn.Conv1d groups semantics)."""
    rng = np.random.default_rng(11)
    cin, cout, t, g = 4, 6, 32, 2
    x = _rand(rng, 2, t, g * cin)
    w = _rand(rng, 7, cin, g * cout) * 0.3
    b = _rand(rng, g * cout)
    got = conv1d(x, w, b, padding=3, groups=g)
    parts = [
        conv1d(x[..., i * cin:(i + 1) * cin],
               w[:, :, i * cout:(i + 1) * cout],
               b[i * cout:(i + 1) * cout], padding=3)
        for i in range(g)
    ]
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(jnp.concatenate(parts, axis=-1)),
                               atol=2e-6, rtol=1e-5)


def _pack_groups(xs, r):
    """Group-major packed layout: [pack(x_g0, r) | pack(x_g1, r) | ...]."""
    return jnp.concatenate([pack(x, r) for x in xs], axis=2)


@pytest.mark.parametrize("k,p,d", [(7, 3, 1), (3, 1, 1), (1, 0, 1)])
def test_packed_conv_grouped_matches_per_group(k, p, d):
    """packed_conv with tuple kernels (feature_group_count conv on a
    group-major packed tensor) == the per-group packed convs stitched."""
    rng = np.random.default_rng(12)
    cin, cout, t, r = 3, 5, 48, 2
    xs = [_rand(rng, 2, t, cin) for _ in range(2)]
    ws = [_rand(rng, k, cin, cout) * 0.3 for _ in range(2)]
    bs = [_rand(rng, cout) for _ in range(2)]
    got = packed_conv(_pack_groups(xs, r), tuple(ws), tuple(bs), r=r,
                      padding=p, dilation=d)
    want = _pack_groups(
        [conv1d(x, w, b, padding=p, dilation=d)
         for x, w, b in zip(xs, ws, bs)], r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-5)


def test_packed_conv_r_shared_input_entry():
    """Entry layer of a grouped stack: shared plain input, tuple kernels,
    r_in=1 -> r_out=2 — output is the group-major packed pair of the two
    plain convs over the SAME input."""
    from ml_audio_restoration_tpu.ops.packed import packed_conv_r

    rng = np.random.default_rng(13)
    cin, cout, t = 4, 6, 48
    x = _rand(rng, 2, t, cin)
    ws = [_rand(rng, 7, cin, cout) * 0.3 for _ in range(2)]
    bs = [_rand(rng, cout) for _ in range(2)]
    got = packed_conv_r(x, tuple(ws), tuple(bs), shared_input=True,
                        r_in=1, r_out=2, padding=3, t_in=t)
    want = _pack_groups(
        [conv1d(x, w, b, padding=3) for w, b in zip(ws, bs)], 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-5)


def test_packed_conv_r_grouped_exit():
    """Exit layer of a grouped stack: group-major r=2 packed input, tuple
    kernels, r_in=2 -> r_out=1 — output channels ARE the per-group plain
    conv outputs (the stereo decoders' (L, R) pair)."""
    from ml_audio_restoration_tpu.ops.packed import packed_conv_r

    rng = np.random.default_rng(14)
    cin, t = 5, 48
    xs = [_rand(rng, 2, t, cin) for _ in range(2)]
    ws = [_rand(rng, 7, cin, 1) * 0.3 for _ in range(2)]
    bs = [_rand(rng, 1) for _ in range(2)]
    got = packed_conv_r(_pack_groups(xs, 2), tuple(ws), tuple(bs),
                        r_in=2, r_out=1, padding=3, t_in=t)
    want = jnp.concatenate(
        [conv1d(x, w, b, padding=3) for x, w, b in zip(xs, ws, bs)],
        axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-5)


def test_stereo_apply_grouped_matches_apply():
    """Plain-layout grouped dual decoder (decode_grouped) == apply()."""
    from ml_audio_restoration_tpu.models import stereo_separator as st

    params, state = st.init(jax.random.PRNGKey(3))
    rng = np.random.default_rng(15)
    x = _rand(rng, 2, 2048, 1) * 0.3
    want, _ = st.apply(params, state, x)
    got = st.apply_grouped(params, state, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-6, rtol=1e-4)


def test_stereo_apply_packed_ungrouped_matches_apply():
    """apply_packed(grouped=False) — the int8 serving/calibration decoder
    path — stays exact vs apply()."""
    from ml_audio_restoration_tpu.models import stereo_separator as st

    params, state = st.init(jax.random.PRNGKey(4))
    rng = np.random.default_rng(16)
    x = _rand(rng, 2, 2048, 1) * 0.3
    want, _ = st.apply(params, state, x)
    got = st.apply_packed(params, state, x, grouped=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-6, rtol=1e-4)

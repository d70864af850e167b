"""PyTorch reference checkpoint (.pth) -> pytree weight converter.

The reference saves {'epoch', 'model_state_dict', 'optimizer_state_dict', ...}
(/root/reference/src/training/trainer.py:724-734) and inference loads
`model_state_dict` per model (/root/reference/src/inference.py:52-53,67-68,86-87).
This module maps those state_dicts onto our (params, state) pytrees:

layout transforms
  Conv1d          weight [out, in, k]  -> [k, in, out]
  ConvTranspose1d weight [in, out, k]  -> [k, in, out] (torch kernel order;
                                          the spatial flip happens in
                                          ops.conv.conv_transpose1d)
  BatchNorm1d     weight/bias -> params.scale/bias;
                  running_mean/var -> state.mean/var
  LSTM            weight_ih_l0 [4H, C] -> w_ih [C, 4H] (gate order i,f,g,o
                  preserved); biases kept separate (b_ih, b_hh)
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
import jax.numpy as jnp


def load_state_dict(path):
    """Load a .pth checkpoint -> {name: np.ndarray} (handles both the full
    trainer dict and a bare state_dict)."""
    import torch

    try:
        # tensors-only checkpoints (everything the reference trainer writes)
        # load without the arbitrary-code-execution surface of full pickle
        ckpt = torch.load(str(path), map_location="cpu", weights_only=True)
    except Exception:
        import warnings

        warnings.warn(f"{path}: not loadable with weights_only=True — "
                      f"falling back to full unpickling (runs code from "
                      f"the file; only do this for trusted checkpoints)")
        ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
        elif isinstance(v, np.ndarray):  # re-saved/exported as numpy
            out[k] = v
    if not out:
        raise ValueError(
            f"{path}: no tensor entries found in checkpoint (keys: "
            f"{list(sd)[:8]}...) — is this a model state_dict?")
    return out


def _conv(sd, prefix):
    return {
        "w": jnp.asarray(np.transpose(sd[f"{prefix}.weight"], (2, 1, 0))),
        "b": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def _convT(sd, prefix):
    return {
        "w": jnp.asarray(np.transpose(sd[f"{prefix}.weight"], (2, 0, 1))),
        "b": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def _bn(sd, prefix):
    params = {
        "scale": jnp.asarray(sd[f"{prefix}.weight"]),
        "bias": jnp.asarray(sd[f"{prefix}.bias"]),
    }
    state = {
        "mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
        "var": jnp.asarray(sd[f"{prefix}.running_var"]),
    }
    return params, state


def _conv_bn(sd, conv_prefix, bn_prefix):
    bn_p, bn_s = _bn(sd, bn_prefix)
    return {"conv": _conv(sd, conv_prefix), "bn": bn_p}, {"bn": bn_s}


def _double_block(sd, prefix):
    """Sequential(conv, bn, lrelu, conv, bn, lrelu) -> {c1, c2} block."""
    c1_p, c1_s = _conv_bn(sd, f"{prefix}.0", f"{prefix}.1")
    c2_p, c2_s = _conv_bn(sd, f"{prefix}.3", f"{prefix}.4")
    return {"c1": c1_p, "c2": c2_p}, {"c1": c1_s, "c2": c2_s}


def convert_denoiser(sd, num_levels: int | None = None):
    params, state = {}, {}
    if num_levels is None:
        # auto-detect the U-Net depth like the sibling converters do —
        # hardcoding 3 would silently TRUNCATE a deeper checkpoint into a
        # structurally-valid-but-wrong pytree
        num_levels = 0
        while f"encoder.{num_levels}.0.weight" in sd:
            num_levels += 1
    enc_p, enc_s = [], []
    for i in range(num_levels):
        p, s = _double_block(sd, f"encoder.{i}")
        enc_p.append(p)
        enc_s.append(s)
    params["encoder"], state["encoder"] = enc_p, enc_s

    params["bottleneck"], state["bottleneck"] = _double_block(sd, "bottleneck")

    up_p, dec_p, dec_s = [], [], []
    for i in range(num_levels):
        up_p.append(_convT(sd, f"decoder.{2 * i}"))
        p, s = _double_block(sd, f"decoder.{2 * i + 1}")
        dec_p.append(p)
        dec_s.append(s)
    params["up"], params["decoder"], state["decoder"] = up_p, dec_p, dec_s

    params["transient_detector"] = [
        _conv(sd, f"transient_detector.{j}") for j in (0, 2, 4)
    ]
    params["final_conv"] = _conv(sd, "final_conv")
    return params, state


def convert_super_resolution(sd):
    params, state = {}, {}
    params["initial"] = _conv(sd, "initial.0")

    blocks_p, blocks_s = [], []
    i = 0
    while f"residual_blocks.{i}.conv1.weight" in sd:
        bn1_p, bn1_s = _bn(sd, f"residual_blocks.{i}.bn1")
        bn2_p, bn2_s = _bn(sd, f"residual_blocks.{i}.bn2")
        blocks_p.append({
            "conv1": _conv(sd, f"residual_blocks.{i}.conv1"),
            "conv2": _conv(sd, f"residual_blocks.{i}.conv2"),
            "bn1": bn1_p,
            "bn2": bn2_p,
        })
        blocks_s.append({"bn1": bn1_s, "bn2": bn2_s})
        i += 1
    params["blocks"], state["blocks"] = blocks_p, blocks_s

    mid_bn_p, mid_bn_s = _bn(sd, "middle.1")
    params["middle"] = {"conv": _conv(sd, "middle.0"), "bn": mid_bn_p}
    state["middle"] = {"bn": mid_bn_s}

    ups = []
    i = 0
    while f"upsample_blocks.{i}.0.weight" in sd:
        ups.append(_convT(sd, f"upsample_blocks.{i}.0"))
        i += 1
    params["upsample"] = ups
    params["hf"] = _conv(sd, "hf_emphasis.0")
    params["recon"] = _conv(sd, "reconstruction")
    return params, state


def convert_stereo_separator(sd):
    params, state = {}, {}
    params["stem"], state["stem"] = _conv_bn(sd, "encoder.0.0", "encoder.0.1")

    blocks_p, blocks_s = [], []
    for i in range(1, 5):
        d_p, d_s = _conv_bn(sd, f"encoder.{i}.0", f"encoder.{i}.1")
        p_p, p_s = _conv_bn(sd, f"encoder.{i}.3", f"encoder.{i}.4")
        blocks_p.append({"dilated": d_p, "pointwise": p_p})
        blocks_s.append({"dilated": d_s, "pointwise": p_s})
    params["blocks"], state["blocks"] = blocks_p, blocks_s

    layers = []
    k = 0
    while f"lstm.weight_ih_l{k}" in sd:
        layers.append({
            "w_ih": jnp.asarray(sd[f"lstm.weight_ih_l{k}"].T),
            "w_hh": jnp.asarray(sd[f"lstm.weight_hh_l{k}"].T),
            "b_ih": jnp.asarray(sd[f"lstm.bias_ih_l{k}"]),
            "b_hh": jnp.asarray(sd[f"lstm.bias_hh_l{k}"]),
        })
        k += 1
    params["lstm"] = layers

    def decoder(prefix):
        l1_p, l1_s = _conv_bn(sd, f"{prefix}.0", f"{prefix}.1")
        l2_p, l2_s = _conv_bn(sd, f"{prefix}.3", f"{prefix}.4")
        l3_p, l3_s = _conv_bn(sd, f"{prefix}.6", f"{prefix}.7")
        return ({"l1": l1_p, "l2": l2_p, "l3": l3_p,
                 "final": _conv(sd, f"{prefix}.9")},
                {"l1": l1_s, "l2": l2_s, "l3": l3_s})

    params["left"], state["left"] = decoder("left_decoder")
    params["right"], state["right"] = decoder("right_decoder")
    return params, state


CONVERTERS = {
    "denoiser": convert_denoiser,
    "super_resolution": convert_super_resolution,
    "stereo_separator": convert_stereo_separator,
}


def load_model(path, model: str):
    """Load a reference .pth for `model` in
    {'denoiser', 'super_resolution', 'stereo_separator'} -> (params, state)."""
    if model not in CONVERTERS:
        raise KeyError(f"unknown model {model!r}; expected {list(CONVERTERS)}")
    sd = load_state_dict(Path(path))
    return CONVERTERS[model](sd)

"""Export our pytree weights back to reference-compatible .pth checkpoints.

The inverse of torch_loader.py: lets models trained in this framework be
served by the original PyTorch application (and closes the round-trip
interop loop the parity tests rely on). Produces exactly the state-dict key
set of the reference modules (denoiser.py / super_resolution.py /
stereo_separator.py), saved as {'epoch', 'model_state_dict'}.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


def _t(x):
    import torch

    return torch.from_numpy(np.array(x, copy=True))


def _conv(sd, prefix, p):
    sd[f"{prefix}.weight"] = _t(np.transpose(np.asarray(p["w"]), (2, 1, 0)))
    sd[f"{prefix}.bias"] = _t(p["b"])


def _convT(sd, prefix, p):
    sd[f"{prefix}.weight"] = _t(np.transpose(np.asarray(p["w"]), (1, 2, 0)))
    sd[f"{prefix}.bias"] = _t(p["b"])


def _bn(sd, prefix, p, s):
    import torch

    sd[f"{prefix}.weight"] = _t(p["scale"])
    sd[f"{prefix}.bias"] = _t(p["bias"])
    sd[f"{prefix}.running_mean"] = _t(s["mean"])
    sd[f"{prefix}.running_var"] = _t(s["var"])
    sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0, dtype=torch.long)


def _conv_bn(sd, conv_prefix, bn_prefix, p, s):
    _conv(sd, conv_prefix, p["conv"])
    _bn(sd, bn_prefix, p["bn"], s["bn"])


def _double_block(sd, prefix, p, s):
    _conv_bn(sd, f"{prefix}.0", f"{prefix}.1", p["c1"], s["c1"])
    _conv_bn(sd, f"{prefix}.3", f"{prefix}.4", p["c2"], s["c2"])


def export_denoiser(params, state) -> dict:
    sd = {}
    for i, (p, s) in enumerate(zip(params["encoder"], state["encoder"])):
        _double_block(sd, f"encoder.{i}", p, s)
    _double_block(sd, "bottleneck", params["bottleneck"], state["bottleneck"])
    for i, (up, p, s) in enumerate(zip(params["up"], params["decoder"],
                                       state["decoder"])):
        _convT(sd, f"decoder.{2 * i}", up)
        _double_block(sd, f"decoder.{2 * i + 1}", p, s)
    for j, layer in zip((0, 2, 4), params["transient_detector"]):
        _conv(sd, f"transient_detector.{j}", layer)
    _conv(sd, "final_conv", params["final_conv"])
    return sd


def export_super_resolution(params, state) -> dict:
    sd = {}
    _conv(sd, "initial.0", params["initial"])
    for i, (p, s) in enumerate(zip(params["blocks"], state["blocks"])):
        _conv(sd, f"residual_blocks.{i}.conv1", p["conv1"])
        _bn(sd, f"residual_blocks.{i}.bn1", p["bn1"], s["bn1"])
        _conv(sd, f"residual_blocks.{i}.conv2", p["conv2"])
        _bn(sd, f"residual_blocks.{i}.bn2", p["bn2"], s["bn2"])
    _conv(sd, "middle.0", params["middle"]["conv"])
    _bn(sd, "middle.1", params["middle"]["bn"], state["middle"]["bn"])
    for i, up in enumerate(params["upsample"]):
        _convT(sd, f"upsample_blocks.{i}.0", up)
    _conv(sd, "hf_emphasis.0", params["hf"])
    _conv(sd, "reconstruction", params["recon"])
    return sd


def export_stereo_separator(params, state) -> dict:
    sd = {}
    _conv_bn(sd, "encoder.0.0", "encoder.0.1", params["stem"], state["stem"])
    for i, (p, s) in enumerate(zip(params["blocks"], state["blocks"]),
                               start=1):
        _conv_bn(sd, f"encoder.{i}.0", f"encoder.{i}.1", p["dilated"],
                 s["dilated"])
        _conv_bn(sd, f"encoder.{i}.3", f"encoder.{i}.4", p["pointwise"],
                 s["pointwise"])
    for k, layer in enumerate(params["lstm"]):
        sd[f"lstm.weight_ih_l{k}"] = _t(np.asarray(layer["w_ih"]).T)
        sd[f"lstm.weight_hh_l{k}"] = _t(np.asarray(layer["w_hh"]).T)
        sd[f"lstm.bias_ih_l{k}"] = _t(layer["b_ih"])
        sd[f"lstm.bias_hh_l{k}"] = _t(layer["b_hh"])
    for side in ("left", "right"):
        p, s = params[side], state[side]
        prefix = f"{side}_decoder"
        _conv_bn(sd, f"{prefix}.0", f"{prefix}.1", p["l1"], s["l1"])
        _conv_bn(sd, f"{prefix}.3", f"{prefix}.4", p["l2"], s["l2"])
        _conv_bn(sd, f"{prefix}.6", f"{prefix}.7", p["l3"], s["l3"])
        _conv(sd, f"{prefix}.9", p["final"])
    return sd


EXPORTERS = {
    "denoiser": export_denoiser,
    "super_resolution": export_super_resolution,
    "stereo_separator": export_stereo_separator,
}


def save_pth(path, model: str, params, state, epoch: int = 0):
    """Write a reference-format .pth checkpoint."""
    import torch

    sd = EXPORTERS[model](params, state)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    torch.save({"epoch": epoch, "model_state_dict": sd}, str(path))
    return path

"""Import reference PyTorch NCSN++ checkpoints into the Flax parameter tree.

The reference persists ``torch.save`` pickles holding
``{step, model: state_dict, optimizer, ema, scaler, config}``
(``Reflected-Diffusion/utils.py:77-86``).  This shim converts the model /
EMA ``state_dict`` (name -> numpy array) into our NHWC parameter tree:

* conv weights   OIHW -> HWIO
* linear weights (out, in) -> (in, out)
* GroupNorm      weight/bias -> scale/bias
* NIN            W (in, out) and b are layout-identical

Used for weight-import parity tests and for serving models trained with
the reference code on TPU.
"""
from __future__ import annotations

import numpy as np


def _conv(sd, prefix):
    return {"conv": {"kernel": np.transpose(sd[prefix + ".weight"], (2, 3, 1, 0)),
                     "bias": sd[prefix + ".bias"]}}


def _linear(sd, prefix):
    return {"kernel": np.transpose(sd[prefix + ".weight"]),
            "bias": sd[prefix + ".bias"]}


def _norm(sd, prefix):
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def _nin(sd, prefix):
    return {"W": sd[prefix + ".W"], "b": sd[prefix + ".b"]}


def _resblock(sd, prefix):
    out = {
        "norm0": _norm(sd, prefix + ".GroupNorm_0"),
        "conv0": _conv(sd, prefix + ".Conv_0"),
        "temb_proj": _linear(sd, prefix + ".Dense_0"),
        "norm1": _norm(sd, prefix + ".GroupNorm_1"),
        "conv1": _conv(sd, prefix + ".Conv_1"),
    }
    if prefix + ".NIN_0.W" in sd:
        out["shortcut"] = _nin(sd, prefix + ".NIN_0")
    return out


def _attn(sd, prefix):
    return {
        "norm": _norm(sd, prefix + ".GroupNorm_0"),
        "q": _nin(sd, prefix + ".NIN_0"),
        "k": _nin(sd, prefix + ".NIN_1"),
        "v": _nin(sd, prefix + ".NIN_2"),
        "proj": _nin(sd, prefix + ".NIN_3"),
    }


def ncsnpp_params_from_torch(sd: dict) -> dict:
    """Build the Flax ``params`` tree for ``rdm_tpu.models.NCSNpp`` from a
    reference torch ``state_dict`` mapping names to numpy arrays.  Accepts
    DDP-prefixed names (``module.``)."""
    sd = {k.removeprefix("module."): np.asarray(v) for k, v in sd.items()}

    params = {
        "time_embed": {"W": sd["time_embed.W"]},
        "time_mlp0": _linear(sd, "time_mlp.0"),
        "time_mlp1": _linear(sd, "time_mlp.2"),
        "input_conv": _conv(sd, "input_conv"),
        "mid_block1": _resblock(sd, "mid_block1"),
        "mid_block2": _resblock(sd, "mid_block2"),
        "out_norm": _norm(sd, "out_norm"),
        "out_conv": _conv(sd, "out_conv"),
    }
    if "label_emb.weight" in sd:
        params["label_emb"] = _linear(sd, "label_emb")
    if "mid_attn.NIN_0.W" in sd:
        params["mid_attn"] = _attn(sd, "mid_attn")

    def walk(torch_list, torch_fmt, ours_fmt, builder, probe):
        k = 0
        while True:
            prefix = torch_fmt.format(k)
            if prefix + probe not in sd:
                break
            params[ours_fmt.format(k)] = builder(sd, prefix)
            k += 1

    walk("down_blocks", "down_blocks.{}", "db{}", _resblock, ".Conv_0.weight")
    walk("up_blocks", "up_blocks.{}", "ub{}", _resblock, ".Conv_0.weight")
    # attention lists contain None gaps in torch (absent keys) at the same
    # indices our tree omits the module — iterate over all present indices.
    for k in range(len([1 for key in sd if key.startswith("down_blocks.") and key.endswith(".Conv_0.weight")])):
        if f"down_attn.{k}.NIN_0.W" in sd:
            params[f"da{k}"] = _attn(sd, f"down_attn.{k}")
    nup = len([1 for key in sd if key.startswith("up_blocks.") and key.endswith(".Conv_0.weight")])
    for k in range(nup):
        if f"up_attn.{k}.NIN_0.W" in sd:
            params[f"ua{k}"] = _attn(sd, f"up_attn.{k}")
    # Down/Upsample modules wrap their conv in a named Conv3x3 ("conv"),
    # so the tree is ds{i}/conv/conv/{kernel,bias}.
    i = 0
    while f"downsample.{i}.Conv_0.weight" in sd:
        params[f"ds{i}"] = {"conv": _conv(sd, f"downsample.{i}.Conv_0")}
        i += 1
    j = 0
    while f"upsample.{j}.Conv_0.weight" in sd:
        params[f"us{j}"] = {"conv": _conv(sd, f"upsample.{j}.Conv_0")}
        j += 1
    return params

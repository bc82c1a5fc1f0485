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


# ---------------------------------------------------------------------------
# Export: Flax params -> reference torch state_dict (for checkpoint parity).

def _conv_out(tree, prefix, out, depth=1):
    node = tree["conv"] if depth == 1 else tree["conv"]["conv"]
    out[prefix + ".weight"] = np.transpose(np.asarray(node["kernel"]), (3, 2, 0, 1))
    out[prefix + ".bias"] = np.asarray(node["bias"])


def _linear_out(tree, prefix, out):
    out[prefix + ".weight"] = np.transpose(np.asarray(tree["kernel"]))
    out[prefix + ".bias"] = np.asarray(tree["bias"])


def _norm_out(tree, prefix, out):
    out[prefix + ".weight"] = np.asarray(tree["scale"])
    out[prefix + ".bias"] = np.asarray(tree["bias"])


def _nin_out(tree, prefix, out):
    out[prefix + ".W"] = np.asarray(tree["W"])
    out[prefix + ".b"] = np.asarray(tree["b"])


def _resblock_out(tree, prefix, out):
    # key order matches torch module registration order (state_dict order)
    _norm_out(tree["norm0"], prefix + ".GroupNorm_0", out)
    _conv_out(tree["conv0"], prefix + ".Conv_0", out)
    _linear_out(tree["temb_proj"], prefix + ".Dense_0", out)
    _norm_out(tree["norm1"], prefix + ".GroupNorm_1", out)
    _conv_out(tree["conv1"], prefix + ".Conv_1", out)
    if "shortcut" in tree:
        _nin_out(tree["shortcut"], prefix + ".NIN_0", out)


def _attn_out(tree, prefix, out):
    _norm_out(tree["norm"], prefix + ".GroupNorm_0", out)
    _nin_out(tree["q"], prefix + ".NIN_0", out)
    _nin_out(tree["k"], prefix + ".NIN_1", out)
    _nin_out(tree["v"], prefix + ".NIN_2", out)
    _nin_out(tree["proj"], prefix + ".NIN_3", out)


def ncsnpp_params_to_torch(params: dict) -> dict:
    """Inverse of :func:`ncsnpp_params_from_torch`: emit a reference-naming
    ``state_dict`` (numpy values, OIHW convs) in the reference model's
    registration order, so ``torch.save``-style checkpoints written by
    :mod:`rdm_tpu.training.checkpoints` load into the reference NCSN++ with
    ``strict=True``."""
    out: dict = {}
    out["time_embed.W"] = np.asarray(params["time_embed"]["W"])
    _linear_out(params["time_mlp0"], "time_mlp.0", out)
    _linear_out(params["time_mlp1"], "time_mlp.2", out)
    if "label_emb" in params:
        _linear_out(params["label_emb"], "label_emb", out)
    _conv_out(params["input_conv"], "input_conv", out)
    k = 0
    while f"db{k}" in params:
        _resblock_out(params[f"db{k}"], f"down_blocks.{k}", out)
        k += 1
    n_down = k
    for k in range(n_down):
        if f"da{k}" in params:
            _attn_out(params[f"da{k}"], f"down_attn.{k}", out)
    i = 0
    while f"ds{i}" in params:
        _conv_out(params[f"ds{i}"]["conv"], f"downsample.{i}.Conv_0", out)
        i += 1
    _resblock_out(params["mid_block1"], "mid_block1", out)
    if "mid_attn" in params:
        _attn_out(params["mid_attn"], "mid_attn", out)
    _resblock_out(params["mid_block2"], "mid_block2", out)
    k = 0
    while f"ub{k}" in params:
        _resblock_out(params[f"ub{k}"], f"up_blocks.{k}", out)
        k += 1
    n_up = k
    for k in range(n_up):
        if f"ua{k}" in params:
            _attn_out(params[f"ua{k}"], f"up_attn.{k}", out)
    j = 0
    while f"us{j}" in params:
        _conv_out(params[f"us{j}"]["conv"], f"upsample.{j}.Conv_0", out)
        j += 1
    _norm_out(params["out_norm"], "out_norm", out)
    _conv_out(params["out_conv"], "out_conv", out)
    return out


def _nest(tree: dict, path: list, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _convert_value(name: str, v: np.ndarray):
    if name == "weight" and v.ndim == 4:
        return "weight", np.transpose(v, (2, 3, 1, 0))  # OIHW -> HWIO
    if name == "weight" and v.ndim == 2:
        return "weight", np.transpose(v)
    return name, v


def adm_params_from_torch(sd: dict) -> dict:
    """Reference ADM state_dict (inner module, ``models/adm.py:69-157``) ->
    Flax tree for ``rdm_tpu.models.adm.ADM``."""
    out: dict = {}
    for key, v in sd.items():
        v = np.asarray(v)
        if "resample_filter" in key:
            continue
        parts = key.split(".")
        # enc.16x16_conv -> enc_16x16_conv etc.
        if parts[0] in ("enc", "dec"):
            parts = [f"{parts[0]}_{parts[1]}"] + parts[2:]
        leaf = parts[-1]
        if len(parts) >= 2 and parts[-2].startswith(("norm", "out_norm")):
            # EDMGroupNorm nests a flax GroupNorm called "gn"
            path = parts[:-1] + ["gn", "scale" if leaf == "weight" else "bias"]
            _nest(out, path, v)
            continue
        leaf, v = _convert_value(leaf, v)
        _nest(out, parts[:-1] + [leaf], v)
    return out


def vdm_params_from_torch(sd: dict) -> dict:
    """Reference VDM state_dict (``models/vdm.py:100-199``) -> Flax tree for
    ``rdm_tpu.models.vdm.VDM``."""
    out: dict = {}
    for key, v in sd.items():
        v = np.asarray(v)
        if "freqs" in key:
            continue
        parts = key.split(".")
        # cond_map.0 / cond_map.2 -> cond_map0 / cond_map1
        if parts[0] == "cond_map":
            parts = [f"cond_map{0 if parts[1] == '0' else 1}"] + parts[2:]
        # out.0 (GroupNorm) / out.2 (Conv2d) -> out_norm / out_conv
        elif parts[0] == "out":
            parts = [("out_norm" if parts[1] == "0" else "out_conv")] + parts[2:]
        # enc.N / dec.N: with attention the reference interleaves
        # [res, attn, res, attn, ...]; ours names them encK / enc_attnK
        elif parts[0] in ("enc", "dec"):
            idx = int(parts[1])
            has_attn = any(k.startswith(f"{parts[0]}.1.qkv") or
                           k.startswith(f"{parts[0]}.1.norm.") for k in sd)
            if has_attn:
                base = f"{parts[0]}{idx // 2}" if idx % 2 == 0 \
                    else f"{parts[0]}_attn{idx // 2}"
            else:
                base = f"{parts[0]}{idx}"
            parts = [base] + parts[2:]
        leaf = parts[-1]
        # plain nn.GroupNorm layers in our VDM (norm1/norm2/norm/out_norm)
        if (len(parts) >= 2 and parts[-2] in ("norm1", "norm2", "norm")) or \
                parts[0] == "out_norm" and len(parts) == 2:
            path = parts[:-1] + ["scale" if leaf == "weight" else "bias"]
            _nest(out, path, v)
            continue
        leaf, v = _convert_value(leaf, v)
        _nest(out, parts[:-1] + [leaf], v)
    return out


def unet1d_params_from_torch(sd: dict) -> dict:
    """Legacy ``Unet1D`` state_dict (``GTO_Halo_DM/DM_scripts/...diffusion.py
    :310-573``) -> Flax tree for ``rdm_tpu.models.unet1d.UNet1D(legacy=True)``.

    Conv1d weights (O, I, k) -> (k, I, O); Linear (O, I) -> (I, O);
    RMSNorm g (1, C, 1) -> (C,).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    out: dict = {}

    def put(path, v):
        _nest(out, path, v)

    def conv1d(prefix, path):
        put(path + ["kernel"], np.transpose(sd[prefix + ".weight"], (2, 1, 0)))
        if prefix + ".bias" in sd:
            put(path + ["bias"], sd[prefix + ".bias"])

    def linear(prefix, path):
        put(path + ["kernel"], np.transpose(sd[prefix + ".weight"]))
        if prefix + ".bias" in sd:
            put(path + ["bias"], sd[prefix + ".bias"])

    def resblock(prefix, path):
        linear(prefix + ".mlp.1", path + ["cond_mlp"])
        for b in ("block1", "block2"):
            conv1d(f"{prefix}.{b}.proj", path + [b, "proj"])
            put(path + [b, "norm", "scale"], sd[f"{prefix}.{b}.norm.weight"])
            put(path + [b, "norm", "bias"], sd[f"{prefix}.{b}.norm.bias"])
        if prefix + ".res_conv.weight" in sd:
            conv1d(prefix + ".res_conv", path + ["res_conv"])

    def lin_attn(prefix, path):
        # Residual(PreNorm(LinearAttention)): .fn.norm (RMSNorm),
        # .fn.fn.to_qkv, .fn.fn.to_out.0 (conv) + .to_out.1 (RMSNorm)
        put(path + ["norm", "g"], sd[prefix + ".fn.norm.g"].reshape(-1))
        conv1d(prefix + ".fn.fn.to_qkv", path + ["fn", "to_qkv"])
        conv1d(prefix + ".fn.fn.to_out.0", path + ["fn", "to_out"])
        put(path + ["fn", "to_out_norm", "g"],
            sd[prefix + ".fn.fn.to_out.1.g"].reshape(-1))

    conv1d("init_conv", ["init_conv"])
    linear("time_mlp.1", ["time_mlp0"])
    linear("time_mlp.3", ["time_mlp1"])
    i = 0
    while f"classes_mlp.{2 * i}.weight" in sd:
        linear(f"classes_mlp.{2 * i}", [f"classes_mlp{i}"])
        i += 1

    lvl = 0
    while f"downs.{lvl}.0.block1.proj.weight" in sd:
        resblock(f"downs.{lvl}.0", [f"down{lvl}_block1"])
        resblock(f"downs.{lvl}.1", [f"down{lvl}_block2"])
        lin_attn(f"downs.{lvl}.2", [f"down{lvl}_attn"])
        conv1d(f"downs.{lvl}.3", [f"down{lvl}_downsample"])
        lvl += 1
    resblock("mid_block1", ["mid_block1"])
    put(["mid_attn", "norm", "g"], sd["mid_attn.fn.norm.g"].reshape(-1))
    conv1d("mid_attn.fn.fn.to_qkv", ["mid_attn", "fn", "to_qkv"])
    conv1d("mid_attn.fn.fn.to_out", ["mid_attn", "fn", "to_out"])
    resblock("mid_block2", ["mid_block2"])
    lvl = 0
    while f"ups.{lvl}.0.block1.proj.weight" in sd:
        resblock(f"ups.{lvl}.0", [f"up{lvl}_block1"])
        resblock(f"ups.{lvl}.1", [f"up{lvl}_block2"])
        lin_attn(f"ups.{lvl}.2", [f"up{lvl}_attn"])
        # upsample: Sequential(Upsample, Conv1d) -> ups.N.3.1.* ; plain
        # Conv1d (is_last) -> ups.N.3.*
        if f"ups.{lvl}.3.1.weight" in sd:
            conv1d(f"ups.{lvl}.3.1", [f"up{lvl}_upsample"])
        else:
            conv1d(f"ups.{lvl}.3", [f"up{lvl}_upsample"])
        lvl += 1
    resblock("final_res_block", ["final_res_block"])
    conv1d("final_conv", ["final_conv"])
    return out


def ncsnpp_ema_param_order(sd_keys) -> list:
    """Order of ``model.parameters()`` with ``requires_grad=True`` in the
    reference model — the order of the EMA ``shadow_params`` list
    (reference ``ema.py:30-31``).  Equals state_dict order minus the frozen
    Fourier ``time_embed.W``."""
    return [k for k in sd_keys if k != "time_embed.W"]

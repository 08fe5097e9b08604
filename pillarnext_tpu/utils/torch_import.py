"""One-way PyTorch -> JAX weight importer.

Loads a reference PillarNeXt checkpoint (.pth, the layout written by
trainer/utils/checkpoint.py:62-89 — raw state_dict / {'state_dict'} /
{'model'}, with optional 'module.' prefixes) and converts it into this
framework's {params, batch_stats} trees for the pillarnet18_aspp detector.
Used to validate metric parity against the released PillarNeXt-B weights
(README.md:28 of the reference) without retraining.

Layout conversions (numerically validated in tests/test_torch_import.py):
  Linear        (out, in)            -> Dense kernel (in, out)
  Conv2d        (out, in, kh, kw)    -> Conv kernel (kh, kw, in, out)
  spconv 2.x    (out, kh, kw, in)    -> Conv kernel (kh, kw, in, out)
  ConvTranspose2d (in, out, kh, kw)  -> ConvTranspose kernel (kh, kw, in, out),
                                        spatially flipped (lax.conv_transpose
                                        correlates where torch convolves)
  BatchNorm     weight/bias/running_mean/running_var -> scale/bias + stats

Strict: every expected flax leaf must be produced and every torch tensor
consumed (unused keys reported) — the import fails loudly on drift.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Read a torch checkpoint into numpy (checkpoint-layout handling parity
    with the reference load_checkpoint, checkpoint.py:28-43)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        sd = ckpt["state_dict"]
    elif isinstance(ckpt, dict) and "model" in ckpt:
        sd = ckpt["model"]
    else:
        sd = ckpt
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy()
    return out


# --------------------------------------------------------------- converters


def linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def conv_kernel(w: np.ndarray, in_channels: int) -> np.ndarray:
    """torch Conv2d (O,I,H,W) or spconv (O,H,W,I) -> flax (H,W,I,O)."""
    if w.shape[1] == in_channels and w.shape[-1] != in_channels:
        return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))  # OIHW
    if w.shape[-1] == in_channels:
        return np.ascontiguousarray(np.transpose(w, (1, 2, 3, 0)))  # OHWI
    # ambiguous (in == kh etc.): prefer torch OIHW
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def conv_transpose_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (I,O,H,W) -> flax ConvTranspose (H,W,I,O).

    flax's lax.conv_transpose uses cross-correlation; torch's transposed
    convolution places the kernel un-flipped, which corresponds to a
    spatially *flipped* correlation kernel.
    """
    k = np.transpose(w, (2, 3, 0, 1))  # (H, W, I, O)
    return np.ascontiguousarray(k[::-1, ::-1])


def _bn(dst_params, dst_stats, torch_prefix, sd):
    dst_params["scale"] = sd.pop(f"{torch_prefix}.weight")
    dst_params["bias"] = sd.pop(f"{torch_prefix}.bias")
    dst_stats["mean"] = sd.pop(f"{torch_prefix}.running_mean")
    dst_stats["var"] = sd.pop(f"{torch_prefix}.running_var")
    sd.pop(f"{torch_prefix}.num_batches_tracked", None)


def _conv_block(p, s, prefix, sd, in_ch):
    """reference SparseConvBlock/ConvBlock {conv, norm} -> flax ConvBlock."""
    p["Conv_0"] = {"kernel": conv_kernel(sd.pop(f"{prefix}.conv.weight"), in_ch)}
    p["BatchNorm_0"], s["BatchNorm_0"] = {}, {}
    _bn(p["BatchNorm_0"], s["BatchNorm_0"], f"{prefix}.norm", sd)


def _residual_block(p, s, prefix, sd, ch):
    """reference SparseBasicBlock {block1{conv,norm}, conv2, norm2}."""
    p["ConvBlock_0"], s["ConvBlock_0"] = {}, {}
    _conv_block(p["ConvBlock_0"], s["ConvBlock_0"], f"{prefix}.block1", sd, ch)
    p["Conv_0"] = {"kernel": conv_kernel(sd.pop(f"{prefix}.conv2.weight"), ch)}
    p["BatchNorm_0"], s["BatchNorm_0"] = {}, {}
    _bn(p["BatchNorm_0"], s["BatchNorm_0"], f"{prefix}.norm2", sd)


def _dense_basic_block(p, s, prefix, sd, ch):
    """reference dense BasicBlock {block1{conv,norm}, block2{conv,norm}}."""
    for j in range(2):
        key = f"ConvBlock_{j}"
        p[key], s[key] = {}, {}
        _conv_block(p[key], s[key], f"{prefix}.block{j + 1}", sd, ch)


def _import_merged_head(hp, hs, sd, tasks, common_heads, head_conv):
    """Concatenate the reference's per-task SepHead tensors into the
    MergedSepHeads layout (models/centerhead.py): deblock/branch1/bn1 merged
    task-major, per-branch final convs grouped by task with hm padded to
    max class count."""
    t = len(tasks)
    branches = {k: (int(v[0]), int(v[1])) for k, v in common_heads.items()}
    hm_pad = max(len(task) for task in tasks)
    branches["hm"] = (hm_pad, 2)
    names = list(branches.keys())

    # deblock: ConvTranspose kernels concat along out axis; BN concat
    db_k = [
        conv_transpose_kernel(sd.pop(f"head.tasks.{ti}.deblock.conv.weight"))
        for ti in range(t)
    ]
    bn = {"scale": [], "bias": [], "mean": [], "var": []}
    for ti in range(t):
        pre = f"head.tasks.{ti}.deblock.norm"
        bn["scale"].append(sd.pop(f"{pre}.weight"))
        bn["bias"].append(sd.pop(f"{pre}.bias"))
        bn["mean"].append(sd.pop(f"{pre}.running_mean"))
        bn["var"].append(sd.pop(f"{pre}.running_var"))
        sd.pop(f"{pre}.num_batches_tracked", None)
    hp["merged"] = {
        "deblock": {
            "ConvTranspose_0": {"kernel": np.concatenate(db_k, axis=-1)},
            "BatchNorm_0": {
                "scale": np.concatenate(bn["scale"]),
                "bias": np.concatenate(bn["bias"]),
            },
        }
    }
    hs["merged"] = {
        "deblock": {
            "BatchNorm_0": {
                "mean": np.concatenate(bn["mean"]),
                "var": np.concatenate(bn["var"]),
            }
        }
    }

    # branch1: per (task, branch) first conv + BN, task-major concat
    k1, b1 = [], []
    bn1 = {"scale": [], "bias": [], "mean": [], "var": []}
    for ti in range(t):
        for name in names:
            tname = name
            k1.append(conv_kernel(sd.pop(f"head.tasks.{ti}.{tname}.0.weight"), head_conv))
            b1.append(sd.pop(f"head.tasks.{ti}.{tname}.0.bias"))
            pre = f"head.tasks.{ti}.{tname}.1"
            bn1["scale"].append(sd.pop(f"{pre}.weight"))
            bn1["bias"].append(sd.pop(f"{pre}.bias"))
            bn1["mean"].append(sd.pop(f"{pre}.running_mean"))
            bn1["var"].append(sd.pop(f"{pre}.running_var"))
            sd.pop(f"{pre}.num_batches_tracked", None)
    hp["merged"]["branch1"] = {
        "kernel": np.concatenate(k1, axis=-1),
        "bias": np.concatenate(b1),
    }
    hp["merged"]["bn1"] = {
        "scale": np.concatenate(bn1["scale"]),
        "bias": np.concatenate(bn1["bias"]),
    }
    hs["merged"]["bn1"] = {
        "mean": np.concatenate(bn1["mean"]),
        "var": np.concatenate(bn1["var"]),
    }

    # per-branch final convs: grouped by task; hm zero-padded to hm_pad
    for name in names:
        c_out = branches[name][0]
        ks, bs = [], []
        for ti in range(t):
            k = conv_kernel(sd.pop(f"head.tasks.{ti}.{name}.3.weight"), head_conv)
            b = sd.pop(f"head.tasks.{ti}.{name}.3.bias")
            if name == "hm" and k.shape[-1] < c_out:
                padn = c_out - k.shape[-1]
                k = np.concatenate([k, np.zeros(k.shape[:-1] + (padn,), k.dtype)], -1)
                b = np.concatenate([b, np.full((padn,), -2.19, b.dtype)])
            ks.append(k)
            bs.append(b)
        hp["merged"][f"out_{name}"] = {
            "kernel": np.concatenate(ks, axis=-1),
            "bias": np.concatenate(bs),
        }


def import_pillarnext(
    state_dict: dict[str, np.ndarray],
    *,
    num_filters=(64, 64),
    layer_nums=(2, 2, 2, 2),
    ds_num_filters=(64, 128, 256, 256),
    num_input_features=64,
    out_channels=256,
    tasks=(),
    common_heads=None,
    num_hm_conv=2,
    merge_tasks=False,     # must match CenterHead.merge_tasks
    merge_branches=False,  # must match CenterHead.merge_branches
) -> tuple[dict, dict]:
    """Convert a pillarnet18(_aspp) state_dict -> (params, batch_stats)."""
    sd = dict(state_dict)
    params: dict[str, Any] = {"reader": {}, "backbone": {}, "neck": {}, "head": {}}
    stats: dict[str, Any] = {"reader": {}, "backbone": {}, "neck": {}, "head": {}}

    # ---- reader PFN layers
    for i in range(len(num_filters)):
        name = f"pfn_layers_{i}"
        p, s = {}, {}
        p["Dense_0"] = {"kernel": linear_kernel(sd.pop(f"reader.pfn_layers.{i}.linear.weight"))}
        p["MaskedBatchNorm_0"], s["MaskedBatchNorm_0"] = {}, {}
        _bn(p["MaskedBatchNorm_0"], s["MaskedBatchNorm_0"], f"reader.pfn_layers.{i}.norm", sd)
        params["reader"][name], stats["reader"][name] = p, s

    # ---- backbone: stage_{i} (strided ConvBlock + residual blocks) + mapping
    in_ch = num_input_features
    for si, n_blocks in enumerate(layer_nums):
        sp, ss = {"down": {}}, {"down": {}}
        _conv_block(sp["down"], ss["down"], f"backbone.blocks.{si}.0", sd, in_ch)
        in_ch = ds_num_filters[si]
        for bi in range(n_blocks):
            key = f"block_{bi}"
            sp[key], ss[key] = {}, {}
            _residual_block(sp[key], ss[key], f"backbone.blocks.{si}.{bi + 1}", sd, in_ch)
        params["backbone"][f"stage_{si}"] = sp
        stats["backbone"][f"stage_{si}"] = ss
    key = "ConvBlock_0"
    params["backbone"][key] = {
        "Conv_0": {"kernel": conv_kernel(sd.pop("backbone.mapping.0.weight"), in_ch)},
        "BatchNorm_0": {},
    }
    stats["backbone"][key] = {"BatchNorm_0": {}}
    _bn(params["backbone"][key]["BatchNorm_0"], stats["backbone"][key]["BatchNorm_0"],
        "backbone.mapping.1", sd)

    # ---- ASPP neck
    params["neck"]["BasicBlock_0"], stats["neck"]["BasicBlock_0"] = {}, {}
    _dense_basic_block(
        params["neck"]["BasicBlock_0"], stats["neck"]["BasicBlock_0"],
        "neck.pre_conv", sd, out_channels,
    )
    params["neck"]["Conv_0"] = {
        "kernel": conv_kernel(sd.pop("neck.conv1x1.weight"), out_channels)
    }
    params["neck"]["shared_dilated_kernel"] = np.ascontiguousarray(
        np.transpose(sd.pop("neck.weight"), (2, 3, 1, 0))
    )
    params["neck"]["ConvBlock_0"], stats["neck"]["ConvBlock_0"] = {}, {}
    _conv_block(
        params["neck"]["ConvBlock_0"], stats["neck"]["ConvBlock_0"],
        "neck.post_conv", sd, out_channels * 6,
    )

    # ---- CenterHead
    params["head"]["shared_conv"] = {
        "kernel": conv_kernel(sd.pop("head.shared_conv.0.weight"), out_channels),
        "bias": sd.pop("head.shared_conv.0.bias"),
    }
    params["head"]["shared_bn"], stats["head"]["shared_bn"] = {}, {}
    _bn(params["head"]["shared_bn"], stats["head"]["shared_bn"], "head.shared_conv.1", sd)

    head_conv = 64
    if merge_tasks and all(int(v[1]) == 2 for v in (common_heads or {}).values()):
        _import_merged_head(
            params["head"], stats["head"], sd, tasks, common_heads, head_conv
        )
        leftovers = [k for k in sd if not k.endswith("num_batches_tracked")]
        if leftovers:
            raise ValueError(
                f"unconsumed torch keys: {leftovers[:10]} "
                f"(+{len(leftovers) - 10 if len(leftovers) > 10 else 0})"
            )
        return params, stats

    for ti, task in enumerate(tasks):
        tp, tsd = {}, {}
        # deblock = ConvBlock(conv_layer=ConvTranspose2d) {conv, norm}
        tp["ConvTransposeBlock_0"] = {
            "ConvTranspose_0": {
                "kernel": conv_transpose_kernel(
                    sd.pop(f"head.tasks.{ti}.deblock.conv.weight")
                )
            },
            "BatchNorm_0": {},
        }
        tsd["ConvTransposeBlock_0"] = {"BatchNorm_0": {}}
        _bn(
            tp["ConvTransposeBlock_0"]["BatchNorm_0"],
            tsd["ConvTransposeBlock_0"]["BatchNorm_0"],
            f"head.tasks.{ti}.deblock.norm",
            sd,
        )

        branches = dict(common_heads)
        branches["hm"] = (len(task), num_hm_conv)
        if merge_branches and all(nc == 2 for _, nc in branches.values()):
            # SepHead(merge_branches): concat branch conv1s + their BNs along
            # output channels into branch1/bn1; finals become out_<name>
            k1, b1 = [], []
            bn1 = {"scale": [], "bias": [], "mean": [], "var": []}
            for bname in branches:
                k1.append(conv_kernel(sd.pop(f"head.tasks.{ti}.{bname}.0.weight"), head_conv))
                b1.append(sd.pop(f"head.tasks.{ti}.{bname}.0.bias"))
                pre = f"head.tasks.{ti}.{bname}.1"
                bn1["scale"].append(sd.pop(f"{pre}.weight"))
                bn1["bias"].append(sd.pop(f"{pre}.bias"))
                bn1["mean"].append(sd.pop(f"{pre}.running_mean"))
                bn1["var"].append(sd.pop(f"{pre}.running_var"))
                sd.pop(f"{pre}.num_batches_tracked", None)
            tp["branch1"] = {
                "kernel": np.concatenate(k1, axis=-1),
                "bias": np.concatenate(b1),
            }
            tp["bn1"] = {
                "scale": np.concatenate(bn1["scale"]),
                "bias": np.concatenate(bn1["bias"]),
            }
            tsd["bn1"] = {
                "mean": np.concatenate(bn1["mean"]),
                "var": np.concatenate(bn1["var"]),
            }
            for bname in branches:
                tp[f"out_{bname}"] = {
                    "kernel": conv_kernel(
                        sd.pop(f"head.tasks.{ti}.{bname}.3.weight"), head_conv
                    ),
                    "bias": sd.pop(f"head.tasks.{ti}.{bname}.3.bias"),
                }
            params["head"][f"task_{ti}"] = tp
            stats["head"][f"task_{ti}"] = tsd
            continue
        for bname, (n_out, n_conv) in branches.items():
            bp, bs = {}, {}
            # torch Sequential: Conv(0), BN(1), ReLU(2), ..., final Conv
            ci = 0
            for li in range(n_conv - 1):
                t_conv = 3 * li
                bp[f"Conv_{ci}"] = {
                    "kernel": conv_kernel(
                        sd.pop(f"head.tasks.{ti}.{bname}.{t_conv}.weight"), head_conv
                    ),
                    "bias": sd.pop(f"head.tasks.{ti}.{bname}.{t_conv}.bias"),
                }
                bp[f"BatchNorm_{li}"], bs[f"BatchNorm_{li}"] = {}, {}
                _bn(
                    bp[f"BatchNorm_{li}"], bs[f"BatchNorm_{li}"],
                    f"head.tasks.{ti}.{bname}.{t_conv + 1}", sd,
                )
                ci += 1
            t_final = 3 * (n_conv - 1)
            bp[f"Conv_{ci}"] = {
                "kernel": conv_kernel(
                    sd.pop(f"head.tasks.{ti}.{bname}.{t_final}.weight"), head_conv
                ),
                "bias": sd.pop(f"head.tasks.{ti}.{bname}.{t_final}.bias"),
            }
            tp[bname], tsd[bname] = bp, bs
        params["head"][f"task_{ti}"] = tp
        stats["head"][f"task_{ti}"] = tsd

    leftovers = [k for k in sd if not k.endswith("num_batches_tracked")]
    if leftovers:
        raise ValueError(f"unconsumed torch keys: {leftovers[:10]} (+{len(leftovers)-10 if len(leftovers)>10 else 0})")
    return params, stats


def _inv_conv_kernel(k: np.ndarray) -> np.ndarray:
    """flax Conv (H,W,I,O) -> torch Conv2d (O,I,H,W)."""
    return np.ascontiguousarray(np.transpose(np.asarray(k), (3, 2, 0, 1)))


def _inv_conv_transpose_kernel(k: np.ndarray) -> np.ndarray:
    """flax ConvTranspose (H,W,I,O, spatially flipped) -> torch (I,O,H,W)."""
    k = np.asarray(k)[::-1, ::-1]
    return np.ascontiguousarray(np.transpose(k, (2, 3, 0, 1)))


def _inv_bn(sd, torch_prefix, p, s):
    sd[f"{torch_prefix}.weight"] = np.asarray(p["scale"])
    sd[f"{torch_prefix}.bias"] = np.asarray(p["bias"])
    sd[f"{torch_prefix}.running_mean"] = np.asarray(s["mean"])
    sd[f"{torch_prefix}.running_var"] = np.asarray(s["var"])


def _inv_conv_block(sd, prefix, p, s):
    sd[f"{prefix}.conv.weight"] = _inv_conv_kernel(p["Conv_0"]["kernel"])
    _inv_bn(sd, f"{prefix}.norm", p["BatchNorm_0"], s["BatchNorm_0"])


def _inv_residual_block(sd, prefix, p, s):
    _inv_conv_block(sd, f"{prefix}.block1", p["ConvBlock_0"], s["ConvBlock_0"])
    sd[f"{prefix}.conv2.weight"] = _inv_conv_kernel(p["Conv_0"]["kernel"])
    _inv_bn(sd, f"{prefix}.norm2", p["BatchNorm_0"], s["BatchNorm_0"])


def export_pillarnext(
    params,
    batch_stats,
    *,
    num_filters=(64, 64),
    layer_nums=(2, 2, 2, 2),
    tasks=(),
    common_heads=None,
    num_hm_conv=2,
) -> dict[str, np.ndarray]:
    """Inverse of :func:`import_pillarnext` for the standard (non-merged)
    pillarnet18_aspp layout: {params, batch_stats} -> a reference-named torch
    state_dict (the layout of trainer/utils/checkpoint.py:62-89 and
    tests/torch_mirror.TModel).

    Used to push weights TRAINED IN THIS FRAMEWORK into the torch mirror for
    the trained-weight flagship parity run (tools/flagship_parity.py
    --overfit): training on the TPU takes minutes where overfitting the
    mirror on the host CPU would take hours.  Round-trip
    (export -> import) is asserted bit-exact in tests/test_torch_import.py.
    """
    p, s = params, batch_stats
    sd: dict[str, np.ndarray] = {}

    for i in range(len(num_filters)):
        rp = p["reader"][f"pfn_layers_{i}"]
        rs = s["reader"][f"pfn_layers_{i}"]
        sd[f"reader.pfn_layers.{i}.linear.weight"] = np.ascontiguousarray(
            np.asarray(rp["Dense_0"]["kernel"]).T
        )
        _inv_bn(
            sd, f"reader.pfn_layers.{i}.norm",
            rp["MaskedBatchNorm_0"], rs["MaskedBatchNorm_0"],
        )

    for si, n_blocks in enumerate(layer_nums):
        bp, bs = p["backbone"][f"stage_{si}"], s["backbone"][f"stage_{si}"]
        _inv_conv_block(sd, f"backbone.blocks.{si}.0", bp["down"], bs["down"])
        for bi in range(n_blocks):
            _inv_residual_block(
                sd, f"backbone.blocks.{si}.{bi + 1}",
                bp[f"block_{bi}"], bs[f"block_{bi}"],
            )
    sd["backbone.mapping.0.weight"] = _inv_conv_kernel(
        p["backbone"]["ConvBlock_0"]["Conv_0"]["kernel"]
    )
    _inv_bn(
        sd, "backbone.mapping.1",
        p["backbone"]["ConvBlock_0"]["BatchNorm_0"],
        s["backbone"]["ConvBlock_0"]["BatchNorm_0"],
    )

    _export_neck_head(sd, p, s, tasks, common_heads, num_hm_conv)
    return sd


def _export_neck_head(sd, p, s, tasks, common_heads, num_hm_conv=2):
    """Shared ASPP-neck + CenterHead export (the layout is identical across
    the pillar / voxel / mvf detector families)."""
    np_, ns = p["neck"], s["neck"]
    for j in range(2):
        _inv_conv_block(
            sd, f"neck.pre_conv.block{j + 1}",
            np_["BasicBlock_0"][f"ConvBlock_{j}"],
            ns["BasicBlock_0"][f"ConvBlock_{j}"],
        )
    sd["neck.conv1x1.weight"] = _inv_conv_kernel(np_["Conv_0"]["kernel"])
    sd["neck.weight"] = _inv_conv_kernel(np_["shared_dilated_kernel"])
    _inv_conv_block(sd, "neck.post_conv", np_["ConvBlock_0"], ns["ConvBlock_0"])

    hp, hs = p["head"], s["head"]
    sd["head.shared_conv.0.weight"] = _inv_conv_kernel(hp["shared_conv"]["kernel"])
    sd["head.shared_conv.0.bias"] = np.asarray(hp["shared_conv"]["bias"])
    _inv_bn(sd, "head.shared_conv.1", hp["shared_bn"], hs["shared_bn"])

    for ti, task in enumerate(tasks):
        tp, tsd = hp[f"task_{ti}"], hs[f"task_{ti}"]
        sd[f"head.tasks.{ti}.deblock.conv.weight"] = _inv_conv_transpose_kernel(
            tp["ConvTransposeBlock_0"]["ConvTranspose_0"]["kernel"]
        )
        _inv_bn(
            sd, f"head.tasks.{ti}.deblock.norm",
            tp["ConvTransposeBlock_0"]["BatchNorm_0"],
            tsd["ConvTransposeBlock_0"]["BatchNorm_0"],
        )
        branches = dict(common_heads)
        branches["hm"] = (len(task), num_hm_conv)
        for bname, (_n_out, n_conv) in branches.items():
            bp, bs = tp[bname], tsd[bname]
            ci = 0
            for li in range(n_conv - 1):
                t_conv = 3 * li
                sd[f"head.tasks.{ti}.{bname}.{t_conv}.weight"] = _inv_conv_kernel(
                    bp[f"Conv_{ci}"]["kernel"]
                )
                sd[f"head.tasks.{ti}.{bname}.{t_conv}.bias"] = np.asarray(
                    bp[f"Conv_{ci}"]["bias"]
                )
                _inv_bn(
                    sd, f"head.tasks.{ti}.{bname}.{t_conv + 1}",
                    bp[f"BatchNorm_{li}"], bs[f"BatchNorm_{li}"],
                )
                ci += 1
            t_final = 3 * (n_conv - 1)
            sd[f"head.tasks.{ti}.{bname}.{t_final}.weight"] = _inv_conv_kernel(
                bp[f"Conv_{ci}"]["kernel"]
            )
            sd[f"head.tasks.{ti}.{bname}.{t_final}.bias"] = np.asarray(
                bp[f"Conv_{ci}"]["bias"]
            )
    return sd


def _inv_conv3d_kernel(k: np.ndarray) -> np.ndarray:
    """flax Conv3d (kz,ky,kx,I,O) -> torch Conv3d (O,I,kz,ky,kx)."""
    return np.ascontiguousarray(np.transpose(np.asarray(k), (4, 3, 0, 1, 2)))


def export_voxelnext(
    params,
    batch_stats,
    *,
    layer_nums=(2, 2, 2, 2),
    ds_layer_strides=(1, 2, 2, 2),
    tasks=(),
    common_heads=None,
    num_hm_conv=2,
) -> dict[str, np.ndarray]:
    """voxel18_aspp {params, batch_stats} (the SPARSE-path param tree of
    SparseResNet3D, models/resnet.py:_sparse_forward) -> a reference-named
    torch state_dict for tests/torch_mirror3d.TVoxelModel (module names
    follow reference sparse_resnet3d.py:9-48: blocks.{i}.{j}, extra_conv,
    mapping).  The reader (mean VFE) has no parameters.

    NOTE the depth-fold ordering caveat in torch_mirror3d's module docstring:
    this export is framework->mirror; importing a REFERENCE-trained voxel
    checkpoint would additionally need the c*D+d -> d*C+c permutation on the
    neck's input stream.
    """
    p, s = params, batch_stats
    sd: dict[str, np.ndarray] = {}
    bp, bs = p["backbone"], s["backbone"]

    for si, (n_blocks, stride) in enumerate(zip(layer_nums, ds_layer_strides)):
        if stride == 1:
            # SparseConvBlock: Conv_0 + BatchNorm_0
            sd[f"backbone.blocks.{si}.0.conv.weight"] = _inv_conv3d_kernel(
                bp[f"stage_{si}_down"]["Conv_0"]["kernel"]
            )
            _inv_bn(
                sd, f"backbone.blocks.{si}.0.norm",
                bp[f"stage_{si}_down"]["BatchNorm_0"],
                bs[f"stage_{si}_down"]["BatchNorm_0"],
            )
        else:
            # _SparseDownConv + separate MaskedBatchNorm
            sd[f"backbone.blocks.{si}.0.conv.weight"] = _inv_conv3d_kernel(
                bp[f"stage_{si}_down"]["kernel"]
            )
            _inv_bn(
                sd, f"backbone.blocks.{si}.0.norm",
                bp[f"stage_{si}_down_bn"], bs[f"stage_{si}_down_bn"],
            )
        for bi in range(n_blocks):
            rp = bp[f"stage_{si}_block_{bi}"]
            rs = bs[f"stage_{si}_block_{bi}"]
            sd[f"backbone.blocks.{si}.{bi + 1}.block1.conv.weight"] = (
                _inv_conv3d_kernel(rp["ConvBlock_0"]["Conv_0"]["kernel"])
            )
            _inv_bn(
                sd, f"backbone.blocks.{si}.{bi + 1}.block1.norm",
                rp["ConvBlock_0"]["BatchNorm_0"], rs["ConvBlock_0"]["BatchNorm_0"],
            )
            sd[f"backbone.blocks.{si}.{bi + 1}.conv2.weight"] = (
                _inv_conv3d_kernel(rp["Conv_0"]["kernel"])
            )
            _inv_bn(
                sd, f"backbone.blocks.{si}.{bi + 1}.norm2",
                rp["BatchNorm_0"], rs["BatchNorm_0"],
            )

    sd["backbone.extra_conv.0.weight"] = _inv_conv3d_kernel(
        bp["extra_conv"]["kernel"]
    )
    _inv_bn(sd, "backbone.extra_conv.1", bp["extra_conv_bn"], bs["extra_conv_bn"])
    # SubM 1x1x1 mapping: flax Dense (I, O) -> torch conv (O, I, 1, 1, 1)
    sd["backbone.mapping.conv.weight"] = np.ascontiguousarray(
        np.asarray(bp["mapping"]["kernel"]).T
    )[:, :, None, None, None]
    _inv_bn(sd, "backbone.mapping.norm", bp["mapping_bn"], bs["mapping_bn"])

    if "neck" in p:  # backbone-only trees allowed (tests)
        _export_neck_head(sd, p, s, tasks, common_heads, num_hm_conv)
    return sd


def export_mvfnext(
    params,
    batch_stats,
    *,
    num_filters=(48, 48),
    layer_nums=(2, 2, 2, 2),
    tasks=(),
    common_heads=None,
    num_hm_conv=2,
) -> dict[str, np.ndarray]:
    """mvf18_aspp {params, batch_stats} -> a torch state_dict for
    tests/torch_mirror_mvf.TMVFModel (reader MVFFeatureNet,
    models/mvf_encoder.py — two view towers + fusion PointNets; reference
    det3d/models/readers/mvf_encoder.py:19-327)."""
    p, s = params, batch_stats
    sd: dict[str, np.ndarray] = {}
    rp, rs = p["reader"], s["reader"]

    def pointnet(prefix, pp, ps):
        sd[f"{prefix}.linear.weight"] = np.ascontiguousarray(
            np.asarray(pp["Dense_0"]["kernel"]).T
        )
        _inv_bn(sd, f"{prefix}.norm", pp["MaskedBatchNorm_0"], ps["MaskedBatchNorm_0"])

    for view in ("pillar_view", "cylinder_view"):
        vp, vs = rp[view], rs[view]
        for i in range(len(num_filters)):
            pointnet(f"reader.{view}.pfn.{i}", vp[f"PFNLayer_{i}"], vs[f"PFNLayer_{i}"])
        blk = 0
        for i, n_blocks in enumerate(layer_nums):
            _inv_conv_block(
                sd, f"reader.{view}.blocks.{i}.0",
                vp[f"ConvBlock_{i}"], vs[f"ConvBlock_{i}"],
            )
            for j in range(n_blocks):
                _inv_residual_block(
                    sd, f"reader.{view}.blocks.{i}.{j + 1}",
                    vp[f"ResidualBlock_{blk}"], vs[f"ResidualBlock_{blk}"],
                )
                blk += 1
    pointnet("reader.pointnet1", rp["pointnet1"], rs["pointnet1"])
    pointnet("reader.pointnet2", rp["pointnet2"], rs["pointnet2"])

    if "neck" in p:  # reader-only trees allowed (tests)
        _export_neck_head(sd, p, s, tasks, common_heads, num_hm_conv)
    return sd


def validate_against_flax(params, batch_stats, model, example_points, example_mask):
    """Sanity: imported trees must match the model's init structure."""
    import jax

    ref = model.init(jax.random.PRNGKey(0), example_points, example_mask)
    ref_p = jax.tree.structure(ref["params"])
    got_p = jax.tree.structure(jax.tree.map(np.asarray, params))
    if ref_p != got_p:
        raise ValueError(f"param tree mismatch:\n{ref_p}\nvs\n{got_p}")
    for a, b in zip(jax.tree.leaves(ref["params"]), jax.tree.leaves(params)):
        if a.shape != np.asarray(b).shape:
            raise ValueError(f"shape mismatch {a.shape} vs {np.asarray(b).shape}")

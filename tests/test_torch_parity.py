"""Composite numeric parity vs a PyTorch mirror of the reference dense path.

Builds torch modules wired exactly like the reference (SparseConvBlock /
SparseBasicBlock order, ASPP shared dilated weight, SepHead branch layout),
imports their weights through utils/torch_import, and compares our
backbone -> ASPP -> CenterHead forward on the same BEV input to ~1e-3.

This catches architecture-wiring divergences (activation order, residual
placement, padding alignment for strided convs, BN eps regimes) that the
per-layer conversion tests cannot.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from pillarnext_tpu.models import ASPPNeck, CenterHead, SparseResNet
from pillarnext_tpu.utils import torch_import as ti

C_IN = 8
FILTERS = [8, 16]
STRIDES = [1, 2]
LAYER_NUMS = [1, 1]
OUT_CH = 16
TASKS = [["car"], ["pedestrian", "cyclist"]]
COMMON = {"reg": (2, 2), "height": (1, 2), "dim": (3, 2), "rot": (2, 2), "vel": (2, 2)}


# ---------------------------------------------------------------- torch mirror
class TConvBlock(tnn.Module):
    def __init__(self, cin, cout, k=3, stride=1, eps=1e-3, mom=0.01):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride=stride, padding=k // 2, bias=False)
        self.norm = tnn.BatchNorm2d(cout, eps=eps, momentum=mom)

    def forward(self, x):
        return tF.relu(self.norm(self.conv(x)))


class TResBlock(tnn.Module):
    """reference SparseBasicBlock: block1(conv-bn-relu), conv2-bn2, +id, relu."""

    def __init__(self, ch, k=3):
        super().__init__()
        self.block1 = TConvBlock(ch, ch, k)
        self.conv2 = tnn.Conv2d(ch, ch, k, padding=k // 2, bias=False)
        self.norm2 = tnn.BatchNorm2d(ch, eps=1e-3, momentum=0.01)

    def forward(self, x):
        return tF.relu(self.norm2(self.conv2(self.block1(x))) + x)


class TBackbone(tnn.Module):
    def __init__(self):
        super().__init__()
        blocks = []
        cin = C_IN
        for f, s, n in zip(FILTERS, STRIDES, LAYER_NUMS):
            stage = [TConvBlock(cin, f, stride=s)] + [TResBlock(f) for _ in range(n)]
            blocks.append(tnn.Sequential(*stage))
            cin = f
        self.blocks = tnn.ModuleList(blocks)
        self.mapping = tnn.Sequential(
            tnn.Conv2d(cin, OUT_CH, 1, bias=False),
            tnn.BatchNorm2d(OUT_CH, eps=1e-3, momentum=0.01),
            tnn.ReLU(),
        )

    def forward(self, x):
        for b in self.blocks:
            x = b(x)
        return self.mapping(x)


class TDenseBasic(tnn.Module):
    """reference dense BasicBlock: two full ConvBlocks + id + relu, torch-
    default BN."""

    def __init__(self, ch):
        super().__init__()
        self.block1 = TConvBlock(ch, ch, eps=1e-5, mom=0.1)
        self.block2 = TConvBlock(ch, ch, eps=1e-5, mom=0.1)

    def forward(self, x):
        return tF.relu(self.block2(self.block1(x)) + x)


class TASPP(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.pre_conv = TDenseBasic(ch)
        self.conv1x1 = tnn.Conv2d(ch, ch, 1, bias=False)
        self.weight = tnn.Parameter(torch.randn(ch, ch, 3, 3) * 0.05)
        self.post_conv = TConvBlock(ch * 6, ch, k=1, eps=1e-5, mom=0.1)

    def forward(self, x):
        x = self.pre_conv(x)
        branches = [x, self.conv1x1(x)] + [
            tF.conv2d(x, self.weight, padding=d, dilation=d) for d in (1, 6, 12, 18)
        ]
        return self.post_conv(torch.cat(branches, dim=1))


class THead(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.shared_conv = tnn.Sequential(
            tnn.Conv2d(ch, 64, 3, padding=1, bias=True),
            tnn.BatchNorm2d(64),
            tnn.ReLU(),
        )
        self.tasks = tnn.ModuleList()
        for task in TASKS:
            mod = tnn.Module()
            mod.deblock = tnn.Sequential()  # placeholder; set below
            deblock = tnn.Module()
            deblock.conv = tnn.ConvTranspose2d(64, 64, 2, stride=2, bias=False)
            deblock.norm = tnn.BatchNorm2d(64)
            mod.deblock = deblock
            branches = dict(COMMON)
            branches["hm"] = (len(task), 2)
            for name, (n_out, n_conv) in branches.items():
                layers = []
                for _ in range(n_conv - 1):
                    layers += [
                        tnn.Conv2d(64, 64, 3, padding=1, bias=True),
                        tnn.BatchNorm2d(64),
                        tnn.ReLU(),
                    ]
                layers.append(tnn.Conv2d(64, n_out, 3, padding=1, bias=True))
                setattr(mod, name, tnn.Sequential(*layers))
            self.tasks.append(mod)

    def forward(self, x):
        x = self.shared_conv(x)
        outs = []
        for task, mod in zip(TASKS, self.tasks):
            h = tF.relu(mod.deblock.norm(mod.deblock.conv(x)))
            branches = dict(COMMON)
            branches["hm"] = (len(task), 2)
            outs.append({name: getattr(mod, name)(h) for name in branches})
        return outs


class TModel(tnn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TBackbone()
        self.neck = TASPP(OUT_CH)
        self.head = THead(OUT_CH)

    def forward(self, x):
        return self.head(self.neck(self.backbone(x)))


def _randomize_bn_stats(model, rng):
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            n = int(m.num_features)
            with torch.no_grad():
                m.running_mean.copy_(
                    torch.from_numpy(rng.normal(0, 0.3, n).astype(np.float32))
                )
                m.running_var.copy_(
                    torch.from_numpy(rng.uniform(0.5, 2.0, n).astype(np.float32))
                )


class TestCompositeParity:
    @pytest.mark.parametrize("merge_tasks", [False, True])
    def test_backbone_neck_head_forward_matches_torch(self, merge_tasks):
        rng = np.random.default_rng(0)
        tmodel = TModel()
        tmodel.eval()
        _randomize_bn_stats(tmodel, rng)

        # torch state_dict keyed like the reference checkpoint
        sd = {}
        for k, v in tmodel.state_dict().items():
            key = k
            if k.startswith("neck.weight"):
                key = "neck.weight"
            sd[key.replace("tasks.", "tasks.")] = v.detach().numpy()
        # rename head branch prefixes: torch module uses head.tasks.N.<branch>
        sd = {k.replace("head.tasks", "head.tasks"): v for k, v in sd.items()}

        params, stats = ti.import_pillarnext(
            sd,
            num_filters=(),  # no reader in this composite
            layer_nums=tuple(LAYER_NUMS),
            ds_num_filters=tuple(FILTERS),
            num_input_features=C_IN,
            out_channels=OUT_CH,
            tasks=TASKS,
            common_heads=COMMON,
            merge_tasks=merge_tasks,
        )
        params.pop("reader")
        stats.pop("reader")

        x = rng.normal(0, 1, (1, C_IN, 16, 16)).astype(np.float32)
        with torch.no_grad():
            ref = tmodel(torch.from_numpy(x))

        backbone = SparseResNet(
            layer_nums=LAYER_NUMS,
            ds_layer_strides=STRIDES,
            ds_num_filters=FILTERS,
            num_input_features=C_IN,
            kernel_size=(3, 3),
            out_channels=OUT_CH,
        )
        neck = ASPPNeck(in_channels=OUT_CH)
        head = CenterHead(
            in_channels=OUT_CH,
            tasks=TASKS,
            weight=0.25,
            code_weights=[1.0] * 10,
            common_heads=COMMON,
            merge_tasks=merge_tasks,
            strides=[2, 2],
            rectifier=[[0.5], [0.5, 0.5]],
            voxel_size=[0.1, 0.1, 8],
            pc_range=[-1, -1, -2, 1, 1, 2],
            out_size_factor=[1, 1],
        )

        xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
        feats = backbone.apply(
            {"params": params["backbone"], "batch_stats": stats["backbone"]}, xj
        )
        feats = neck.apply(
            {"params": params["neck"], "batch_stats": stats["neck"]}, feats
        )
        preds = head.apply(
            {"params": params["head"], "batch_stats": stats["head"]}, feats
        )

        for ti_, (ref_task, our_task) in enumerate(zip(ref, preds)):
            for name in ref_task:
                r = ref_task[name].numpy()
                o = np.transpose(np.asarray(our_task[name]), (0, 3, 1, 2))
                np.testing.assert_allclose(
                    o, r, atol=2e-3, rtol=1e-3,
                    err_msg=f"task {ti_} branch {name}",
                )

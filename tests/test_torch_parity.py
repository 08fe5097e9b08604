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

import jax
import jax.numpy as jnp

from pillarnext_tpu.models import ASPPNeck, CenterHead, SparseResNet
from pillarnext_tpu.utils import torch_import as ti

import torch_mirror as tm

C_IN = 8
FILTERS = [8, 16]
STRIDES = [1, 2]
LAYER_NUMS = [1, 1]
OUT_CH = 16
TASKS = [["car"], ["pedestrian", "cyclist"]]
COMMON = {"reg": (2, 2), "height": (1, 2), "dim": (3, 2), "rot": (2, 2), "vel": (2, 2)}




class TModel(tnn.Module):
    """Composite mirror (no reader): backbone -> ASPP -> head, built from the
    shared torch_mirror oracle classes."""

    def __init__(self):
        super().__init__()
        self.backbone = tm.TBackbone(C_IN, FILTERS, STRIDES, LAYER_NUMS, OUT_CH)
        self.neck = tm.TASPP(OUT_CH)
        self.head = tm.THead(OUT_CH, TASKS, COMMON)

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
    @pytest.mark.parametrize(
        "merge_tasks,merge_branches",
        [(False, False), (True, False), (False, True)],
        ids=["plain", "merged-tasks", "merged-branches"],
    )
    def test_backbone_neck_head_forward_matches_torch(self, merge_tasks, merge_branches):
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
            merge_branches=merge_branches,
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
            merge_branches=merge_branches,
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

"""Multi-task-group CenterPoint head, decode, and on-device post-processing.

Capability parity with the reference CenterHead/SepHead
(det3d/models/heads/centerhead.py:12-384), redesigned for XLA:

- The per-sample, per-class Python NMS loop with dynamic boolean masking
  (centerhead.py:332-384) becomes a fully batched, fixed-size pipeline:
  masks demote scores to NEG_INF, NMS is the static on-device kernel
  (core/nms.py), and every output is (B, max_dets) with a validity mask.
- The IoU-loss box decode (centerhead.py:171-205) is performed at the M
  gathered center indices instead of densely over H*W — pointwise decode
  commutes with gather, so the math is identical and ~200x cheaper.
- Feature maps are NHWC.

Head layout (centerhead.py:105-126): shared 3x3 conv(+BN+ReLU); per task
group an optional transpose-conv upsample (stride > 1) and one 3x3-conv
branch per output {reg, height, dim, rot, vel[, iou], hm}, hm's final bias
initialized to -2.19.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pillarnext_tpu.core import nms as nms_lib
from pillarnext_tpu.models import losses
from pillarnext_tpu.models.layers import (
    BN_EPS_DENSE,
    BN_MOMENTUM_DENSE,
    ConvTransposeBlock,
    MLPHead,
    MLPHeadParams,
)

NEG_INF = nms_lib.NEG_INF


class SepHead(nn.Module):
    """One task group's branch bank (reference centerhead.py:12-57)."""

    heads: Mapping[str, tuple[int, int]]  # name -> (out_channels, num_conv)
    stride: int = 1
    head_conv: int = 64
    init_bias: float = -2.19
    final_kernel: int = 3
    # Exact fusion of the branches' FIRST convs: every branch reads the same
    # deblock output, so the R per-branch [3x3 conv + BN + ReLU] stacks
    # concatenate along output channels into ONE dense conv (64 -> R*64) +
    # BN(R*64) + ReLU — identical math, and R*64 output lanes fill the MXU
    # where 64-lane convs run half-empty.  Requires num_conv == 2 everywhere
    # (the reference configuration).  Param layout: branch1/bn1/out_<name>
    # (utils/torch_import.py concatenates per-branch reference tensors).
    merge_branches: bool = False
    # Fused EVAL execution on the STANDARD param layout (round-4 winner):
    # merged conv1 (exact output-channel concat) + ONE BLOCK-DIAGONAL final
    # conv per task — out lane j of branch b reads only channels
    # [b*64, b*64+64); the off-block weights are structural zeros assembled
    # at apply time from the per-branch Conv_1 params, so the math is
    # exactly the R separate branch convs.  Kills the head's real cost: 36
    # final convs with 1-3 output channels (extreme MXU underfill).  On-chip
    # A/B at flagship shapes (tools/head_bank_probe.py, v5e): 7.06 ms fused
    # vs 13.31 ms separate vs 13.35 ms conv1-merge-only vs 47.9 ms 9-tap
    # einsum bank (vs 67 ms grouped-conv MergedSepHeads, r3).  Params are
    # declared through MLPHeadParams (identical variable tree), so train /
    # checkpoints / torch import-export are untouched; training still runs
    # the separate branches (BN batch-stat updates stay per-branch).
    fuse_eval: bool = True
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        x,
        train: bool = False,
        only: tuple[str, ...] | None = None,
        skip_deblock: bool = False,
        return_feats: bool = False,
        patch_mask=None,
    ):
        """``only`` restricts which branches run (candidate-sparse predict
        evaluates dim/rot/vel on gathered 5x5 patches of the deblock output
        instead of densely — ``skip_deblock=True`` feeds such patches
        straight to the branches, sharing the branch params by name).
        ``return_feats`` additionally returns the post-deblock feature map
        the patches must be gathered from."""
        if self.stride > 1 and not skip_deblock:
            x = ConvTransposeBlock(
                self.head_conv, self.stride, axis_name=self.axis_name, dtype=self.dtype
            )(x, train)
        if only is None and self.merge_branches and all(
            nc == 2 for _, nc in self.heads.values()
        ):
            names = list(self.heads.keys())
            h = nn.Conv(
                len(names) * self.head_conv,
                (self.final_kernel, self.final_kernel),
                padding="SAME",
                use_bias=True,
                dtype=self.dtype,
                name="branch1",
            )(x)
            h = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM_DENSE,
                epsilon=BN_EPS_DENSE,
                axis_name=self.axis_name if train else None,
                dtype=self.dtype,
                name="bn1",
            )(h)
            h = nn.relu(h)
            out = {}
            for bi, name in enumerate(names):
                channels = self.heads[name][0]
                xb = h[..., bi * self.head_conv : (bi + 1) * self.head_conv]
                out[name] = nn.Conv(
                    channels,
                    (self.final_kernel, self.final_kernel),
                    padding="SAME",
                    use_bias=True,
                    bias_init=nn.initializers.constant(
                        self.init_bias if name == "hm" else 0.0
                    ),
                    dtype=self.dtype,
                    name=f"out_{name}",
                )(xb)
            return out
        names = [n for n in self.heads if only is None or n in only]
        if (
            self.fuse_eval
            and not train
            and not self.merge_branches
            and all(nc == 2 for _, nc in self.heads.values())
        ):
            out = self._fused_branches(x, names, patch_mask)
            return (out, x) if return_feats else out
        out = {}
        for name in names:
            channels, num_conv = self.heads[name]
            out[name] = MLPHead(
                channels,
                num_conv,
                head_conv=self.head_conv,
                final_bias_init=self.init_bias if name == "hm" else 0.0,
                kernel_size=self.final_kernel,
                axis_name=self.axis_name,
                dtype=self.dtype,
                name=name,
            )(x, train, mask=patch_mask)
        return (out, x) if return_feats else out

    def _fused_branches(self, x, names, patch_mask):
        """Merged conv1 + block-diagonal final conv over ``names`` (see the
        ``fuse_eval`` field for the derivation and measurements).  Reads the
        standard per-branch params through MLPHeadParams; eval-mode BN only
        (running stats, flax BatchNorm semantics mirrored exactly)."""
        k = self.final_kernel
        hc = self.head_conv
        dt = self.dtype or x.dtype
        cin = x.shape[-1]
        c0s, bns, c1s, couts = [], [], [], []
        for name in names:
            channels, _ = self.heads[name]
            c0, bn, c1 = MLPHeadParams(
                channels,
                head_conv=hc,
                final_bias_init=self.init_bias if name == "hm" else 0.0,
                kernel_size=k,
                name=name,
            )(cin)
            c0s.append(c0)
            bns.append(bn)
            c1s.append(c1)
            couts.append(channels)

        pad = ((k // 2, k // 2), (k // 2, k // 2))
        dn = ("NHWC", "HWIO", "NHWC")
        w1 = jnp.concatenate([c[0] for c in c0s], axis=-1)
        b1 = jnp.concatenate([c[1] for c in c0s])
        h = jax.lax.conv_general_dilated(
            x.astype(dt), w1.astype(dt), (1, 1), pad, dimension_numbers=dn
        )
        h = h + b1.astype(dt)
        # eval BatchNorm, flax semantics: mul = rsqrt(var+eps)*scale in dtype
        mean = jnp.concatenate([b[2] for b in bns]).astype(dt)
        mul = jax.lax.rsqrt(
            jnp.concatenate([b[3] for b in bns]).astype(dt) + BN_EPS_DENSE
        ) * jnp.concatenate([b[0] for b in bns]).astype(dt)
        h = (h - mean) * mul + jnp.concatenate([b[1] for b in bns]).astype(dt)
        h = nn.relu(h)
        if patch_mask is not None:
            h = h * patch_mask

        co = sum(couts)
        w2 = jnp.zeros((k, k, len(names) * hc, co), jnp.float32)
        b2 = jnp.concatenate([c[1] for c in c1s])
        col = 0
        for i, (c1, c) in enumerate(zip(c1s, couts)):
            w2 = w2.at[:, :, i * hc : (i + 1) * hc, col : col + c].set(c1[0])
            col += c
        y = jax.lax.conv_general_dilated(
            h, w2.astype(dt), (1, 1), pad, dimension_numbers=dn
        )
        y = y + b2.astype(dt)
        out, col = {}, 0
        for name, c in zip(names, couts):
            out[name] = y[..., col : col + c]
            col += c
        return out


class MergedSepHeads(nn.Module):
    """All task groups' SepHeads fused into task-batched convolutions.

    The reference runs one SepHead per task group sequentially
    (centerhead.py:120-126) — on the flagship that is 6 deblocks + 84 small
    3x3 convs of 64 channels, each a separate underfilled MXU dispatch.
    Because every task reads the SAME shared feature map, the per-task
    weights can be concatenated along output channels/groups with *identical
    math*:

      - deblock: one ConvTranspose 64 -> T*64 (+ BN over T*64, per-channel =
        per-task) — exact concatenation of the T deblocks.
      - branch conv1 (+BN+ReLU): one grouped conv, feature_group_count=T,
        64 -> T*(R*64) where R = #branches — exact.
      - branch conv2: per branch one grouped conv T*(64) -> T*out — exact.

    hm branches with different class counts are padded to max(num_cls) and
    sliced per task.  Param layout is merged (import via
    utils/torch_import.py, which concatenates the reference's per-task
    tensors); requires every task to share stride and num_conv==2.
    """

    heads: Mapping[str, tuple[int, int]]  # branch -> (out_channels, num_conv)
    num_tasks: int
    hm_sizes: Sequence[int]  # per-task class count
    stride: int = 1
    head_conv: int = 64
    init_bias: float = -2.19
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        t = self.num_tasks
        hc = self.head_conv
        hm_pad = max(self.hm_sizes)
        branches = dict(self.heads)
        branches["hm"] = (hm_pad, branches.get("hm", (hm_pad, 2))[1])
        names = list(branches.keys())
        r = len(names)

        if self.stride > 1:
            x = ConvTransposeBlock(
                hc * t, self.stride, axis_name=self.axis_name, dtype=self.dtype,
                name="deblock",
            )(x, train)
        else:
            x = jnp.tile(x, (1, 1, 1, t))

        # conv1 of every branch of every task: one grouped conv
        h = nn.Conv(
            t * r * hc, (3, 3), padding="SAME", feature_group_count=t,
            use_bias=True, dtype=self.dtype, name="branch1",
        )(x)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis_name=self.axis_name if train else None, dtype=self.dtype,
            name="bn1",
        )(h)
        h = nn.relu(h)

        outs = [dict() for _ in range(t)]
        for bi, name in enumerate(names):
            c_out, num_conv = branches[name]
            assert num_conv == 2, "MergedSepHeads requires num_conv == 2"
            # input channels of branch `name` across tasks: task-major layout
            hin = jnp.concatenate(
                [
                    h[..., (ti * r + bi) * hc : (ti * r + bi) * hc + hc]
                    for ti in range(t)
                ],
                axis=-1,
            )
            bias_init = self.init_bias if name == "hm" else 0.0
            y = nn.Conv(
                t * c_out, (3, 3), padding="SAME", feature_group_count=t,
                use_bias=True,
                bias_init=nn.initializers.constant(bias_init),
                dtype=self.dtype, name=f"out_{name}",
            )(hin)
            for ti in range(t):
                width = self.hm_sizes[ti] if name == "hm" else c_out
                outs[ti][name] = y[..., ti * c_out : ti * c_out + width]
        return outs


class CenterHead(nn.Module):
    in_channels: int
    tasks: Sequence[Sequence[str]]  # class names per task group
    weight: float
    code_weights: Sequence[float]
    common_heads: Mapping[str, Sequence[int]]
    strides: Sequence[int]
    init_bias: float = -2.19
    share_conv_channel: int = 64
    num_hm_conv: int = 2
    with_reg_iou: bool = False
    # Exact task-batched fusion of the per-task SepHeads (MergedSepHeads).
    # Default OFF: XLA's TPU lowering of feature_group_count convs is
    # pathological at these shapes (measured 67 ms vs 12 ms for the separate
    # SepHeads on the flagship) — the merged layout exists for import parity
    # and for backends where grouped convs lower well.
    merge_tasks: bool = False
    # fuse each task's branch-first convs into one dense conv (see SepHead)
    merge_branches: bool = False
    # fused eval execution on the standard layout (see SepHead.fuse_eval)
    fuse_eval: bool = True
    voxel_size: Sequence[float] | None = None
    pc_range: Sequence[float] | None = None
    out_size_factor: Sequence[int] | None = None
    rectifier: Sequence[Sequence[float]] = ()
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @property
    def num_classes(self):
        return [len(t) for t in self.tasks]

    @property
    def with_iou(self):
        return "iou" in self.common_heads

    @nn.compact
    def __call__(self, x, train: bool = False, test_cfg=None):
        """Forward (dense branch maps), or — with ``test_cfg`` — the full
        candidate-sparse predict: hm/reg/height[/iou] run dense (candidate
        SELECTION reads them at every cell: score threshold, range mask, IoU
        rectification), while dim/rot/vel are evaluated ONLY at the selected
        candidates, on gathered (2R+1)x(2R+1) patches of the deblock output
        (R = num_conv * k//2, the branch's receptive radius).  The patch
        convs share the dense branches' parameters and SAME zero padding, so
        candidate values are mathematically identical to the dense maps at
        those cells — the flagship's 36 dim/rot/vel convs at 336^2 collapse
        to ~10k patch evaluations."""
        x = nn.Conv(
            self.share_conv_channel, (3, 3), padding="SAME", use_bias=True,
            dtype=self.dtype, name="shared_conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
            name="shared_bn",
        )(x)
        x = nn.relu(x)

        heads_common = {
            k: (int(v[0]), int(v[1])) for k, v in self.common_heads.items()
        }
        uniform = (
            self.merge_tasks
            and len(set(int(s) for s in self.strides)) == 1
            and all(int(v[1]) == 2 for v in self.common_heads.values())
            and self.num_hm_conv == 2
        )
        if uniform:
            outs = MergedSepHeads(
                heads_common,
                num_tasks=len(self.tasks),
                hm_sizes=tuple(self.num_classes),
                stride=int(self.strides[0]),
                head_conv=self.share_conv_channel,
                init_bias=self.init_bias,
                axis_name=self.axis_name,
                dtype=self.dtype,
                name="merged",
            )(x, train)
            return outs if test_cfg is None else self.predict(outs, test_cfg)

        sparse_names = ("dim", "rot", "vel")
        candidate_sparse = (
            test_cfg is not None
            and not train
            and bool(test_cfg.get("candidate_sparse_head", False))
            and not self.merge_branches
            and all(n in heads_common for n in sparse_names)
        )

        seps = []
        for task_id, (num_cls, stride) in enumerate(zip(self.num_classes, self.strides)):
            heads = dict(heads_common)
            heads["hm"] = (num_cls, self.num_hm_conv)
            seps.append(
                SepHead(
                    heads,
                    stride=int(stride),
                    head_conv=self.share_conv_channel,
                    init_bias=self.init_bias,
                    merge_branches=self.merge_branches,
                    fuse_eval=self.fuse_eval,
                    axis_name=self.axis_name,
                    dtype=self.dtype,
                    name=f"task_{task_id}",
                )
            )

        if not candidate_sparse:
            outs = [sep(x, train) for sep in seps]
            return outs if test_cfg is None else self.predict(outs, test_cfg)

        dense_names = tuple(
            n for n in list(heads_common) + ["hm"] if n not in sparse_names
        )
        partials, feats = [], []
        for sep in seps:
            partial, feat = sep(x, False, only=dense_names, return_feats=True)
            partials.append(partial)
            feats.append(feat)

        # receptive radius of the deepest sparse branch: num_conv stacked
        # 3x3 convs see (2*num_conv+1)^2; a larger patch stays exact for
        # shallower branches (their window just sits strictly inside it)
        rad = max(
            int(v[1]) for n, v in self.common_heads.items() if n in sparse_names
        )
        p = 2 * rad + 1

        def drv_fn(task_id, idx_b):
            """dim/rot/vel at flat candidate indices, via patch evaluation
            (raw branch outputs, f32) — same math as gathering the dense
            maps at ``idx_b``."""
            feat = feats[task_id]
            b, h, w, hc = feat.shape
            n = idx_b.shape[1]
            r = idx_b // w
            c = idx_b % w
            dr, dc = np.meshgrid(
                np.arange(-rad, rad + 1), np.arange(-rad, rad + 1), indexing="ij"
            )
            dr = jnp.asarray(dr.reshape(-1), idx_b.dtype)
            dc = jnp.asarray(dc.reshape(-1), idx_b.dtype)
            rr = r[..., None] + dr  # (b, n, P*P)
            cc = c[..., None] + dc
            ok = (rr >= 0) & (rr < h) & (cc >= 0) & (cc < w)
            flat = jnp.where(ok, rr * w + cc, 0).reshape(b, n * p * p)
            rows = jax.vmap(lambda f, i: f[i])(feat.reshape(b, h * w, hc), flat)
            patches = jnp.where(
                ok.reshape(b, n * p * p)[..., None], rows, 0
            ).reshape(b * n, p, p, hc)
            # out-of-map patch positions must stay zero through every
            # intermediate conv layer, like the dense map's SAME padding
            pmask = ok.reshape(b * n, p, p, 1).astype(patches.dtype)
            out = seps[task_id](
                patches, False, only=sparse_names, skip_deblock=True,
                patch_mask=pmask,
            )
            return tuple(
                out[name][:, rad, rad, :].astype(jnp.float32).reshape(b, n, -1)
                for name in sparse_names
            )

        return self.predict(partials, test_cfg, drv_fn=drv_fn)

    # ---------------- loss ----------------

    def _decode_at_inds(self, preds, ind, task_id):
        """Decode [x, y, z, dx, dy, dz, yaw] boxes at flat center indices
        (identical pointwise math to centerhead.py:171-205, applied post-
        gather)."""
        w = preds["hm"].shape[2]
        reg = losses.gather_feature_map(preds["reg"].astype(jnp.float32), ind)
        hei = losses.gather_feature_map(preds["height"].astype(jnp.float32), ind)
        dim = jnp.exp(
            jnp.clip(
                losses.gather_feature_map(preds["dim"].astype(jnp.float32), ind),
                -5.0,
                5.0,
            )
        )
        rot = losses.gather_feature_map(preds["rot"].astype(jnp.float32), ind)
        yaw = jnp.arctan2(rot[..., 0:1], rot[..., 1:2])

        xs = (ind % w).astype(jnp.float32)[..., None] + reg[..., 0:1]
        ys = (ind // w).astype(jnp.float32)[..., None] + reg[..., 1:2]
        factor = float(self.out_size_factor[task_id])
        xs = xs * factor * self.voxel_size[0] + self.pc_range[0]
        ys = ys * factor * self.voxel_size[1] + self.pc_range[1]
        return jnp.concatenate([xs, ys, hei, dim, yaw], axis=-1)  # (B, M, 7)

    def loss(self, example, preds_dicts):
        """Total loss + per-task log dicts (reference centerhead.py:142-229).

        ``example`` carries per-task lists: hm (B,H,W,C), ind/mask/cat (B,M),
        anno_box (B,M,10), gt_boxes (B,M,7).
        """
        total_loss = 0.0
        logs = []
        code_weights = jnp.asarray(self.code_weights, jnp.float32)
        for task_id, preds in enumerate(preds_dicts):
            hm = jnp.clip(
                jax.nn.sigmoid(preds["hm"].astype(jnp.float32)), 1e-4, 1 - 1e-4
            )
            ind = example["ind"][task_id]
            mask = example["mask"][task_id]
            hm_loss = losses.fast_focal_loss(
                hm, example["hm"][task_id], ind, mask, example["cat"][task_id]
            )

            # anno order: [reg(2), height(1), dim(3), vel(2), rot(2)]
            anno_pred = jnp.concatenate(
                [
                    preds["reg"],
                    preds["height"],
                    preds["dim"],
                    preds["vel"],
                    preds["rot"],
                ],
                axis=-1,
            ).astype(jnp.float32)
            box_loss = losses.reg_loss(
                anno_pred, mask, ind, example["anno_box"][task_id]
            )
            loc_loss = (box_loss * code_weights).sum()

            task_loss = hm_loss + self.weight * loc_loss
            # (task names are attached by the trainer when formatting — jit
            # outputs must be arrays)
            log = {
                "hm_loss": hm_loss,
                "loc_loss": loc_loss,
                "loc_loss_elem": box_loss,
                "num_positive": mask.sum(),
            }

            if self.with_iou or self.with_reg_iou:
                boxes7 = self._decode_at_inds(preds, ind, task_id)
                gt7 = example["gt_boxes"][task_id]
                if self.with_iou:
                    iou_loss = losses.iou_pred_loss(
                        preds["iou"].astype(jnp.float32),
                        mask,
                        ind,
                        jax.lax.stop_gradient(boxes7),
                        gt7,
                    )
                    task_loss = task_loss + iou_loss
                    log["iou_loss"] = iou_loss
                if self.with_reg_iou:
                    iou_reg = losses.iou_reg_loss(boxes7, mask, gt7)
                    task_loss = task_loss + self.weight * iou_reg
                    log["iou_reg_loss"] = iou_reg

            log["loss"] = task_loss
            logs.append(log)
            total_loss = total_loss + task_loss
        return total_loss, logs

    # ---------------- predict ----------------

    def predict(self, preds_dicts, test_cfg, drv_fn=None):
        """Decode + per-class NMS, fixed-size output (centerhead.py:231-384).

        ``drv_fn(task_id, flat_idx) -> (dim, rot, vel)`` overrides how the
        regression values are obtained at the selected candidates (the
        candidate-sparse head passes a patch evaluator; default gathers the
        dense maps).

        All task groups sharing a map resolution are batched through ONE
        exact top-k and ONE vmapped NMS over the b*sum(C_t) lanes (the
        reference dispatches per task sequentially, centerhead.py:310-330;
        per-lane math is identical — the per-task IoU thresholds ride along
        as traced scalars — so outputs are bit-equal to the per-task loop
        while the radix-select/NMS kernels run full-width).

        Returns dict of arrays over the merged task groups:
          box3d_lidar (B, D, 9), scores (B, D), label_preds (B, D),
          valid (B, D) — D = sum over tasks/classes of nms_post_max_size.
        """
        post_range = jnp.asarray(test_cfg["post_center_limit_range"], jnp.float32)
        nms_cfg = test_cfg["nms"]
        pre = int(nms_cfg["nms_pre_max_size"])
        post = int(nms_cfg["nms_post_max_size"])
        nms_type = test_cfg.get("nms_type", "iou3d")

        # ---- phase 1: per-task dense score/validity maps (cheap) ----
        lanes = []  # per task: dict of dense maps + lane scores
        for task_id, preds in enumerate(preds_dicts):
            b, h, w, num_cls = preds["hm"].shape
            hm = jax.nn.sigmoid(preds["hm"].astype(jnp.float32)).reshape(b, h * w, num_cls)
            reg = preds["reg"].astype(jnp.float32).reshape(b, h * w, 2)
            hei = preds["height"].astype(jnp.float32).reshape(b, h * w, 1)
            if "iou" in preds:
                iou = (preds["iou"].astype(jnp.float32).reshape(b, h * w) + 1.0) * 0.5
            else:
                iou = jnp.ones((b, h * w), jnp.float32)

            cols = jnp.arange(h * w, dtype=jnp.float32) % w
            rows = jnp.floor(jnp.arange(h * w, dtype=jnp.float32) / w)
            factor = float(test_cfg["out_size_factor"][task_id])
            xs = (cols[None, :, None] + reg[..., 0:1]) * factor * test_cfg["voxel_size"][0] + test_cfg["pc_range"][0]
            ys = (rows[None, :, None] + reg[..., 1:2]) * factor * test_cfg["voxel_size"][1] + test_cfg["pc_range"][1]
            pos3 = jnp.concatenate([xs, ys, hei], axis=-1)  # (B, HW, 3)

            scores = hm.max(axis=-1)
            labels = hm.argmax(axis=-1)
            in_range = jnp.all(pos3 >= post_range[:3], axis=-1) & jnp.all(
                pos3 <= post_range[3:], axis=-1
            )
            score_ok = scores > float(test_cfg["score_threshold"])
            base_valid = in_range & score_ok

            iou_c = jnp.clip(iou, 0.0, 1.0)
            rect = jnp.asarray(self.rectifier[task_id], jnp.float32)[labels]
            rect_scores = jnp.power(scores, 1.0 - rect) * jnp.power(iou_c, rect)

            cls_ids = jnp.arange(num_cls)
            lane_scores = jnp.where(
                base_valid[..., None] & (labels[..., None] == cls_ids),
                rect_scores[..., None],
                NEG_INF,
            ).transpose(0, 2, 1)  # (B, C, HW)
            lanes.append(
                {
                    "task_id": task_id,
                    "b": b,
                    "hw": h * w,
                    "num_cls": num_cls,
                    "lane_scores": lane_scores,
                    "pos3": pos3,
                    "rect_scores": rect_scores,
                    "preds": preds,
                    "thresh": np.asarray(
                        nms_cfg["nms_iou_threshold"][task_id], np.float32
                    ).reshape(-1),
                }
            )

        # ---- phase 2: grouped candidate selection + NMS ----
        # Tasks with the same map size run in ONE radix select and ONE
        # vmapped NMS; selection/decode/NMS per lane is unchanged.
        all_boxes = [None] * len(lanes)
        all_scores = [None] * len(lanes)
        all_labels = [None] * len(lanes)
        all_valid = [None] * len(lanes)
        label_offsets = np.cumsum([0] + [t["num_cls"] for t in lanes])

        groups: dict[int, list[dict]] = {}
        for t in lanes:
            groups.setdefault(t["hw"], []).append(t)

        for hw, group in groups.items():
            b = group[0]["b"]
            c_tot = sum(t["num_cls"] for t in group)
            scores_g = jnp.concatenate(
                [t["lane_scores"] for t in group], axis=1
            ).reshape(b * c_tot, hw)

            # candidate selection FIRST, then decode only candidates — the
            # full (B, HW, 9) decode (exp, arctan2, 9-ch concat over the
            # whole heatmap) and the (B*C, HW, 9) broadcast both commute
            # with the gather, so everything past pos3 runs on 1000 rows
            # per lane instead of 113k.  The exact path is a radix select
            # (ops/topk.py) — bit-identical to lax.top_k at a fraction of
            # its full-lane-sort cost; approx_topk (legacy, off) swaps it
            # for approx_max_k (recall ~0.95 on the tail).
            pre_cap = min(pre, hw)
            if test_cfg.get("approx_topk", False):
                cand_scores, cand_idx = jax.lax.approx_max_k(scores_g, pre_cap)
            else:
                from pillarnext_tpu.ops.topk import exact_top_k

                cand_scores, cand_idx = exact_top_k(scores_g, pre_cap)
            cand_idx = cand_idx.reshape(b, c_tot, pre_cap)
            cand_scores = cand_scores.reshape(b, c_tot, pre_cap)

            boxes_parts = []
            cls_start = 0
            for t in group:
                num_cls = t["num_cls"]
                preds = t["preds"]
                idx_b = cand_idx[:, cls_start : cls_start + num_cls].reshape(
                    b, num_cls * pre_cap
                )

                def gather_b(dense, ix=idx_b):
                    return jax.vmap(lambda d, i: d[i])(dense, ix)

                c_pos3 = gather_b(t["pos3"])
                if drv_fn is not None:
                    raw_dim, c_rot, c_vel = drv_fn(t["task_id"], idx_b)
                else:
                    raw_dim = gather_b(
                        preds["dim"].astype(jnp.float32).reshape(b, hw, 3)
                    )
                    c_rot = gather_b(
                        preds["rot"].astype(jnp.float32).reshape(b, hw, 2)
                    )
                    c_vel = gather_b(
                        preds["vel"].astype(jnp.float32).reshape(b, hw, 2)
                    )
                c_dim = jnp.exp(raw_dim)
                c_yaw = jnp.arctan2(c_rot[..., 0:1], c_rot[..., 1:2])
                boxes_parts.append(
                    jnp.concatenate([c_pos3, c_dim, c_vel, c_yaw], axis=-1).reshape(
                        b, num_cls, pre_cap, 9
                    )
                )
                cls_start += num_cls

            cand_boxes = jnp.concatenate(boxes_parts, axis=1).reshape(
                b * c_tot, pre_cap, 9
            )
            lane_thresh = jnp.tile(
                jnp.concatenate(
                    [
                        jnp.broadcast_to(jnp.asarray(t["thresh"]), (t["num_cls"],))
                        for t in group
                    ]
                ),
                b,
            ).reshape(b, c_tot).reshape(b * c_tot)

            def run_one(boxes_s, scores_s, th):
                if nms_type == "circle":
                    return nms_lib.circle_nms(boxes_s[:, :2], scores_s, th, pre_cap, post)
                nms_boxes = boxes_s[:, [0, 1, 2, 3, 4, 5, 8]]
                return nms_lib.rotated_nms(nms_boxes, scores_s, th, pre_cap, post)

            sel_c, sel_valid = jax.vmap(run_one)(
                cand_boxes,
                cand_scores.reshape(b * c_tot, pre_cap),
                lane_thresh,
            )
            sel_c = sel_c.reshape(b, c_tot, post)
            sel_valid = sel_valid.reshape(b, c_tot, post)
            cand_boxes = cand_boxes.reshape(b, c_tot, pre_cap, 9)

            # split results back to their task groups (original task order)
            cls_start = 0
            for t in group:
                num_cls = t["num_cls"]
                ti = t["task_id"]
                sl = slice(cls_start, cls_start + num_cls)
                sel_boxes = jnp.take_along_axis(
                    cand_boxes[:, sl], sel_c[:, sl, :, None], axis=2
                ).reshape(b, num_cls * post, 9)
                sel = jnp.take_along_axis(
                    cand_idx[:, sl], sel_c[:, sl], axis=2
                ).reshape(b, num_cls * post)
                all_boxes[ti] = sel_boxes
                all_scores[ti] = jnp.take_along_axis(t["rect_scores"], sel, axis=1)
                all_labels[ti] = (
                    jnp.broadcast_to(
                        (label_offsets[ti] + jnp.arange(num_cls)[:, None]).astype(
                            jnp.int32
                        ),
                        (num_cls, post),
                    )
                    .reshape(1, -1)
                    .repeat(b, axis=0)
                )
                all_valid[ti] = sel_valid[:, sl].reshape(b, num_cls * post)
                cls_start += num_cls

        return {
            "box3d_lidar": jnp.concatenate(all_boxes, axis=1),
            "scores": jnp.where(
                jnp.concatenate(all_valid, axis=1),
                jnp.concatenate(all_scores, axis=1),
                0.0,
            ),
            "label_preds": jnp.concatenate(all_labels, axis=1),
            "valid": jnp.concatenate(all_valid, axis=1),
        }

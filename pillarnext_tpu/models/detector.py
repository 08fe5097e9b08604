"""Composition root: reader -> backbone -> neck -> head.

Capability parity with the reference SingleStageDetector
(det3d/models/detectors/single_stage.py:5-59).  Functional flax style: the
module's ``__call__`` produces head outputs; ``loss``/``predict`` are applied
via ``nn.apply`` against the same bound module, so the whole train step and
the whole predict step each compile into one XLA program (no per-sample host
loop, no D2H copies mid-path).
"""

from __future__ import annotations

from typing import Any

from flax import linen as nn


class SingleStageDetector(nn.Module):
    reader: nn.Module
    backbone: nn.Module | None = None
    neck: nn.Module | None = None
    head: nn.Module | None = None
    post_processing: Any = None

    def extract_feat(self, points, mask, train: bool = False):
        x = self.reader(points, mask, train)
        if self.backbone is not None:
            x = self.backbone(x, train)
        if self.neck is not None:
            x = self.neck(x, train)
        return x

    def __call__(self, points, mask, train: bool = False):
        x = self.extract_feat(points, mask, train)
        return self.head(x, train)

    def loss(self, example, train: bool = True):
        """Training step body: forward + head loss -> (loss, per-task logs)."""
        preds = self(example["points"], example["points_mask"], train)
        return self.head.loss(example, preds)

    def predict(self, example):
        """Eval step body: forward + decode + NMS -> fixed-size detections."""
        cfg = self.post_processing
        if hasattr(cfg, "get") and cfg.get("candidate_sparse_head", False):
            # candidate-sparse head: selection-critical branches run dense,
            # dim/rot/vel are patch-evaluated at the selected candidates
            # only (exact; see CenterHead.__call__)
            x = self.extract_feat(example["points"], example["points_mask"], False)
            return self.head(x, False, test_cfg=cfg)
        preds = self(example["points"], example["points_mask"], False)
        return self.head.predict(preds, cfg)

"""Optimistic bucketed-capacity inference.

The static-shape pipeline sizes its compact pillar table at trace time
(``reader.pillar_capacity``); the per-frame cost of the reader, the sparse
stages, and the densify gather scales with that CAPACITY, not with the
frame's true occupancy (measured: 98304 -> 73728 caps is +5% end-to-end on
the flagship, tools/perf_probe lineage).  The reference has no such knob —
``torch.unique`` sizes everything dynamically (reference
det3d/models/readers/pillar_encoder.py:109-111) — so a fixed capacity must
be provisioned for the worst frame and every typical frame overpays.

``AdaptivePredictor`` closes that gap without giving up exactness:

- the predict program is compiled at several capacities (buckets);
- each frame is dispatched OPTIMISTICALLY at the current bucket; the same
  compiled program returns the on-device overflow telemetry (active sites
  routed to the dump slot — models/pillar_encoder.py, models/resnet.py);
- ``resolve()`` checks the flags after the fact: a frame that overflowed is
  transparently recomputed at the largest bucket and the operating bucket
  is raised for subsequent frames.

When nothing overflows, a smaller table provably produces bit-identical
detections (the active set and every per-slot value are unchanged; only
dead rows disappear — equivalence-tested in tests/test_serving.py), so the
resolved outputs always equal the largest-capacity results while typical
frames run at the cheapest safe capacity.  Dispatch stays fully pipelined:
no device fetch happens until ``resolve``.

CAPACITY TRACKING (``track_capacity``, default on): every resolve also
reads the frame's true reader active-site count from the same telemetry
transfer and learns the stream's per-sample requirement; the operating
bucket becomes ``ceil(peak * track_margin)`` quantized up to
``track_quantum`` — typically tighter than any hand-chosen ladder (the
static ladder is still the starting point and the repair ceiling, and the
learned bucket can only LOWER the dispatch capacity, never raise it above
the ladder's choice).  Exactness is unchanged: overflow at the learned
bucket repairs at the max bucket like any other.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field
from typing import Any, Sequence

import numpy as np


def _round_cap(c: int, quantum: int = 4096) -> int:
    return max(quantum, int(round(c / quantum)) * quantum)


@dataclass
class _Pending:
    out: Any  # device detection dict
    overflow: Any  # () int32 device scalar
    active: Any  # () int32 device scalar — reader active-site count
    inputs: tuple  # (points, mask) — kept for a possible repair
    bucket: int


@dataclass
class AdaptivePredictor:
    """See module docstring.

    Args:
        model_cfg: resolved ``cfg["model"]`` dict (``reader.pillar_capacity``
            is the SAFE maximum / largest bucket), or a callable
            ``capacity -> model`` for hand-built modules.
        variables: model variables (capacity-independent — parameter shapes
            never depend on table capacity, so one checkpoint serves all
            buckets).
        buckets: ascending per-sample capacities; default
            ``(3/4 * max, max)``; required when ``model_cfg`` is a callable.
    """

    model_cfg: Any
    variables: Any
    buckets: Sequence[int] | None = None
    level: int = 0  # current operating bucket index
    repaired: int = 0  # frames recomputed at the max bucket so far
    # CAPACITY TRACKING: learn the operating bucket from the measured
    # active-site counts instead of the static ladder.  Every resolve
    # records the per-sample active-set requirement (the compact table is a
    # shared pool across the batch, so requirement = ceil(total_active/B));
    # the operating bucket becomes round_up(peak * margin) once any frame
    # has been observed.  The peak never decays (conservative: a stream
    # that shrinks keeps the proven-safe bucket), overflow still repairs
    # bit-exactly at the max bucket, and a no-overflow frame at a smaller
    # capacity is provably bit-identical (module docstring) — so tracking
    # changes cost, never results.  New buckets compile lazily on first
    # dispatch (warm them by streaming a few representative frames).
    track_capacity: bool = True
    track_margin: float = 1.06
    track_quantum: int = 4096
    peak_required: int = 0  # largest per-sample active requirement seen
    _learned: int | None = None
    _fns: dict = field(default_factory=dict)

    def __post_init__(self):
        if self.buckets is None:
            if callable(self.model_cfg):
                raise ValueError("buckets are required with a model factory")
            max_cap = int(self.model_cfg["reader"].get("pillar_capacity", 131072))
            self.buckets = (_round_cap(max_cap * 3 // 4), max_cap)
        self.buckets = tuple(sorted(int(b) for b in self.buckets))

    def _fn(self, bucket: int):
        if bucket not in self._fns:
            import jax

            if callable(self.model_cfg):
                model = self.model_cfg(bucket)
            else:
                from pillarnext_tpu.utils import builders

                cfg = copy.deepcopy(self.model_cfg)
                max_cap = int(cfg["reader"].get("pillar_capacity", 131072))
                cfg["reader"]["pillar_capacity"] = bucket
                bb = cfg.get("backbone")
                if isinstance(bb, dict) and (
                    bb.get("sparse_stages_eval") == "tile"
                    or bb.get("tile_stride1")
                ):
                    # the tile capacity must track the bucket too: scale it
                    # proportionally below the max bucket, and use the FULL
                    # tile grid (<=0 sentinel, resnet._tile_map_for) at the
                    # max bucket so an overflow repair is guaranteed exact
                    # for the tile capacity as well as the site capacity
                    if bucket >= max_cap:
                        bb["tile_capacity"] = 0
                    else:
                        tc = int(bb.get("tile_capacity", 12288))
                        bb["tile_capacity"] = max(
                            256, -(-tc * bucket // max_cap)
                        )
                model = builders.build_model(cfg)

            @jax.jit
            def f(v, points, mask):
                out, tel = model.apply(
                    v,
                    {"points": points, "points_mask": mask},
                    method=model.predict,
                    mutable="telemetry",
                )
                flat = jax.tree_util.tree_flatten_with_path(tel)[0]
                ov = sum(
                    (
                        leaf.sum().astype("int32")
                        for path, leaf in flat
                        if "overflow" in jax.tree_util.keystr(path)
                    ),
                    start=0,
                )
                # reader active-site count (capacity-tracking signal); the
                # reader's compact table is what the bucket sizes.  NB the
                # substring match deliberately excludes the stage/tile/
                # cylinder counters — the bucket scales pillar/voxel
                # capacity only
                act = sum(
                    (
                        leaf.max().astype("int32")
                        for path, leaf in flat
                        if "pillar_active" in jax.tree_util.keystr(path)
                        or "voxel_active" in jax.tree_util.keystr(path)
                    ),
                    start=0,
                )
                return out, ov, act

            self._fns[bucket] = f
        return self._fns[bucket]

    def __call__(self, points, mask) -> _Pending:
        """Dispatch one batch at the current bucket (no host sync)."""
        bucket = self._operating_bucket()
        out, ov, act = self._fn(bucket)(self.variables, points, mask)
        return _Pending(out, ov, act, (points, mask), bucket)

    def _operating_bucket(self) -> int:
        """Current dispatch capacity: the static ladder's bucket, improved
        (never worsened) by the learned requirement once frames have been
        observed."""
        b = self.buckets[self.level]
        if self.track_capacity and self._learned is not None:
            b = min(b, self._learned)
        return int(b)

    def _observe(self, required: int):
        """Feed one frame's per-sample active requirement into the tracker."""
        if required <= self.peak_required:
            return
        self.peak_required = required
        if not self.track_capacity:
            return
        q = self.track_quantum
        cand = -(-int(required * self.track_margin) // q) * q  # ceil quantize
        self._learned = int(min(max(cand, q), self.buckets[-1]))

    def resolve(self, pending: Sequence[_Pending]) -> list:
        """Fence; repair any overflowed frames at the max bucket; return the
        (exact) detection dicts in order."""
        import jax.numpy as jnp

        if not pending:
            return []
        max_bucket = self.buckets[-1]
        # ONE host transfer for all flags + active counts (per-scalar
        # fetches cost a device round-trip each — expensive through
        # remote-TPU runtimes)
        flags = np.asarray(
            jnp.stack(
                [
                    jnp.stack([jnp.asarray(p.overflow), jnp.asarray(p.active)])
                    for p in pending
                ]
            )
        )
        outs = []
        for p, (overflowed, active) in zip(pending, flags):
            batch = int(p.inputs[0].shape[0])
            if overflowed > 0 and p.bucket < max_bucket:
                # frame exceeded the optimistic capacity: recompute exactly
                out, ov, act = self._fn(max_bucket)(self.variables, *p.inputs)
                ov_act = np.asarray(jnp.stack([jnp.asarray(ov), jnp.asarray(act)]))
                if int(ov_act[0]) > 0:
                    raise RuntimeError(
                        "active set overflows even the largest capacity "
                        f"bucket ({max_bucket}); raise reader.pillar_capacity "
                        "(or backbone.tile_capacity if a hand-built model "
                        "factory pins the tile capacity)"
                    )
                outs.append(out)
                self.repaired += 1
                self.level = len(self.buckets) - 1  # stop being optimistic
                self._observe(-(-int(ov_act[1]) // batch))
            elif overflowed > 0:
                raise RuntimeError(
                    "active set overflows the largest capacity bucket "
                    f"({max_bucket}); raise reader.pillar_capacity "
                    "(or backbone.tile_capacity if a hand-built model "
                    "factory pins the tile capacity)"
                )
            else:
                outs.append(p.out)
                self._observe(-(-int(active) // batch))
        return outs

    def predict(self, points, mask):
        """Latency-mode convenience: dispatch + resolve one batch."""
        return self.resolve([self(points, mask)])[0]

    def warmup(self, points, mask):
        """Compile + run every bucket once (so an overflow repair never pays
        a compile inside a latency-sensitive serving loop).  With capacity
        tracking, also resolve the warmup frame so the tracker learns its
        requirement and the LEARNED bucket compiles here too — not inside
        the serving loop."""
        import jax

        for b in self.buckets:
            out, ov, act = self._fn(b)(self.variables, points, mask)
            jax.tree.map(lambda x: np.asarray(x).ravel()[:1], (out, ov, act))
        if self.track_capacity:
            self.resolve([self(points, mask)])
            learned = self._operating_bucket()
            if learned not in self._fns:
                out, ov, act = self._fn(learned)(self.variables, points, mask)
                jax.tree.map(lambda x: np.asarray(x).ravel()[:1], (out, ov, act))

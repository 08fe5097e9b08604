#!/usr/bin/env python
"""Bisect training-step HBM between submodules: compile grad of partial
forwards and report temp sizes.  Usage: python tools/mem_bisect.py [batch]"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from pillarnext_tpu.utils import builders
from pillarnext_tpu.utils.config import load_experiment

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
N = 200_000

cfg = load_experiment(
    Path(__file__).resolve().parent.parent
    / "pillarnext_tpu/configs/experiments/nusc_det_pp18_aspp_iou_sp.yaml"
)
model = builders.build_model(cfg["model"])
rng = np.random.default_rng(0)
pts = rng.uniform(-1, 1, (B, N, 5)).astype(np.float32) * 40
mask = np.ones((B, N), bool)
pts_j, mask_j = jnp.asarray(pts), jnp.asarray(mask)
variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), pts_j[:1], mask_j[:1])
variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)
GB = 1024**3


def probe(name, method):
    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            pts_j, mask_j, True, method=method, mutable=["batch_stats"],
        )
        return jax.tree.reduce(
            lambda a, b: a + b, jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)), out)
        )

    g = jax.jit(jax.grad(loss_fn))
    c = g.lower(variables["params"]).compile()
    ma = c.memory_analysis()
    print(f"{name:20s} temp={ma.temp_size_in_bytes / GB:6.2f} GB", flush=True)


probe("reader", lambda m, p, k, t: m.reader(p, k, t))
probe("reader+backbone", lambda m, p, k, t: m.backbone(m.reader(p, k, t), t))
probe("extract_feat", lambda m, p, k, t: m.extract_feat(p, k, t))
probe("full_forward", lambda m, p, k, t: m(p, k, t))

# per-stage bisect: truncated backbones over the real reader output
from pillarnext_tpu.models.resnet import SparseResNet

for k in range(1, 5):
    bb = SparseResNet(
        layer_nums=[2, 2, 2, 2][:k],
        ds_layer_strides=[1, 2, 2, 2][:k],
        ds_num_filters=[64, 128, 256, 256][:k],
        num_input_features=64,
        axis_name=None,
        dtype=jnp.bfloat16,
    )

    def loss_fn(p, bbp):
        feat, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            pts_j, mask_j, True,
            method=lambda m, a, b, t: m.reader(a, b, t), mutable=["batch_stats"],
        )
        out, _ = bb.apply(bbp, feat, True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32))

    bbv = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(bb.init, jax.random.PRNGKey(0),
                       jnp.zeros((B, 1344, 1344, 64), jnp.bfloat16)),
    )
    g = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
    c = g.lower(variables["params"], bbv).compile()
    ma = c.memory_analysis()
    print(f"stages[:{k}]          temp={ma.temp_size_in_bytes / GB:6.2f} GB", flush=True)

# hypothesis tests on stage-0 only
from flax import linen as nn
from pillarnext_tpu.models.layers import BN_EPS_SPARSE


class Blk(nn.Module):
    mode: str
    n_convs: int

    @nn.compact
    def __call__(self, x):
        identity = x
        for i in range(self.n_convs):
            x = nn.Conv(64, (3, 3), padding="SAME", use_bias=False, dtype=jnp.bfloat16)(x)
            if self.mode == "full":
                x = nn.BatchNorm(use_running_average=False, momentum=0.99,
                                 epsilon=BN_EPS_SPARSE, dtype=jnp.bfloat16)(x)
            elif self.mode == "evalbn":
                x = nn.BatchNorm(use_running_average=True, momentum=0.99,
                                 epsilon=BN_EPS_SPARSE, dtype=jnp.bfloat16)(x)
            if i < self.n_convs - 1:
                x = nn.relu(x)
        return nn.relu(x + identity)


class Stage0Var(nn.Module):
    mode: str

    @nn.compact
    def __call__(self, x):
        R = nn.remat(Blk)
        x = R(self.mode, 1, name="b0")(x)
        x = R(self.mode, 2, name="b1")(x)
        x = R(self.mode, 2, name="b2")(x)
        return x


for mode in ("full", "evalbn", "nobn"):
    m0 = Stage0Var(mode)
    xin = jnp.zeros((B, 1344, 1344, 64), jnp.bfloat16)
    v0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                      jax.eval_shape(m0.init, jax.random.PRNGKey(0), xin))

    def lf(p, x):
        out, _ = m0.apply(p, x, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32))

    g = jax.jit(jax.grad(lf, argnums=(0, 1)))
    c = g.lower(v0, xin).compile()
    ma = c.memory_analysis()
    print(f"stage0[{mode:7s}]      temp={ma.temp_size_in_bytes / GB:6.2f} GB", flush=True)

"""MVF-family parity: the jax MVFFeatureNet (models/mvf_encoder.py) vs the
independent torch CPU mirror (tests/torch_mirror_mvf.py) with the SAME
weights via utils.torch_import.export_mvfnext — small grid, B=1.

Small-grid leg of the 3-family parity ladder (config-grid trained-weight
run: tools/mvf_parity.py)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent))

from torch_mirror_mvf import TMVFModel, TSingleView, TPointNet  # noqa: E402

from pillarnext_tpu.models.mvf_encoder import MVFFeatureNet
from pillarnext_tpu.utils.torch_import import export_mvfnext

VOXEL = [0.2, 0.2, 4.0]
PC_RANGE = [-6.4, -6.4, -2.0, 6.4, 6.4, 2.0]  # pillar grid 64 x 64
CYL_SIZE = [5.625, 0.125, 50.0]
CYL_RANGE = [-180.0, -2.0, 0.0, 180.0, 2.0, 50.0]  # cylinder grid 32 x 64
NUM_FILTERS = (8, 8)
LAYER_NUMS = (1, 1)
STRIDES = (1, 2)
FILTERS = (8, 16)
OUT_CH = 16


def make_points(n=500, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.zeros((1, n, 5), np.float32)
    pts[..., :2] = rng.uniform(-6, 6, (1, n, 2))
    pts[..., 2] = rng.uniform(-1.8, 1.8, (1, n))
    pts[..., 3:] = rng.uniform(0, 1, (1, n, 2))
    mask = rng.uniform(size=(1, n)) < 0.9
    return pts, mask


def _randomize(variables, seed=1):
    rng = np.random.default_rng(seed)

    def rnd(path, x):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if x.ndim == 0:
            return x
        if name.endswith("var"):
            return jnp.asarray(rng.uniform(0.5, 2.0, x.shape).astype(np.float32))
        return jnp.asarray(rng.normal(0, 0.3, x.shape).astype(np.float32))

    return jax.tree_util.tree_map_with_path(rnd, variables)


def test_mvf_reader_matches_torch_mirror():
    pts, mask = make_points()
    reader = MVFFeatureNet(
        in_channels=5, voxel_size=VOXEL, pc_range=PC_RANGE,
        cylinder_size=CYL_SIZE, cylinder_range=CYL_RANGE,
        num_filters=NUM_FILTERS, layer_nums=LAYER_NUMS,
        ds_layer_strides=STRIDES, ds_num_filters=FILTERS,
        kernel_size=(3, 3), out_channels=OUT_CH,
        pillar_capacity=1024, cylinder_capacity=1024,
    )
    variables = _randomize(
        reader.init(jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(mask))
    )
    bev_jax = np.asarray(
        reader.apply(variables, jnp.asarray(pts), jnp.asarray(mask))
    )  # (1, H/ds, W/ds, OUT_CH)

    sd = export_mvfnext(
        {"reader": variables["params"]},
        {"reader": variables["batch_stats"]},
        num_filters=NUM_FILTERS, layer_nums=LAYER_NUMS,
    )

    # assemble the mirror's reader pieces (TMVFModel also builds neck/head,
    # which this reader-level test does not need)
    in_ch = 20
    tm_pillar = TSingleView(in_ch, NUM_FILTERS, LAYER_NUMS, STRIDES, FILTERS).eval()
    tm_cyl = TSingleView(in_ch, NUM_FILTERS, LAYER_NUMS, STRIDES, FILTERS).eval()
    tm_p1 = TPointNet(in_ch, FILTERS[-1]).eval()
    tm_p2 = TPointNet(FILTERS[-1] * 3, OUT_CH).eval()

    def load(mod, prefix):
        state = {
            k[len(prefix):]: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in sd.items() if k.startswith(prefix)
        }
        missing, unexpected = mod.load_state_dict(state, strict=False)
        assert not unexpected, (prefix, unexpected)
        assert all("num_batches_tracked" in m for m in missing), (prefix, missing)

    load(tm_pillar, "reader.pillar_view.")
    load(tm_cyl, "reader.cylinder_view.")
    load(tm_p1, "reader.pointnet1.")
    load(tm_p2, "reader.pointnet2.")

    # mirror forward (mirrors TMVFModel.forward without neck/head)
    pc = np.asarray(PC_RANGE, np.float64)
    cyl = np.asarray(CYL_RANGE, np.float64)
    vs = np.asarray(VOXEL, np.float64)
    cs = np.asarray(CYL_SIZE, np.float64)
    p = pts[0][mask[0]]
    ok = np.ones(len(p), bool)
    for ax in range(3):
        ok &= (p[:, ax] >= pc[ax]) & (p[:, ax] < pc[ax + 3])
    p = p[ok].astype(np.float64)

    hp = wp = 64
    hc, wc = 32, 64
    up = np.clip(np.floor((p[:, 0] - pc[0]) / vs[0]).astype(np.int64), 0, wp - 1)
    vp = np.clip(np.floor((p[:, 1] - pc[1]) / vs[1]).astype(np.int64), 0, hp - 1)
    phi = np.arctan2(p[:, 1], p[:, 0]) / np.pi * 180.0
    rho = np.sqrt(p[:, 0] ** 2 + p[:, 1] ** 2)
    uc = np.clip(np.floor((phi - cyl[0]) / cs[0]).astype(np.int64), 0, wc - 1)
    vc = np.clip(np.floor((p[:, 2] - cyl[1]) / cs[1]).astype(np.int64), 0, hc - 1)
    pid, cid = vp * wp + up, vc * wc + uc

    from torch_mirror_mvf import _scatter_mean

    def decorate(pos3, u, v, cell, n_cells, sizes, rmin):
        pos3_t = torch.from_numpy(pos3.astype(np.float32))
        mean = _scatter_mean(pos3_t, torch.from_numpy(cell), n_cells)
        f_cluster = pos3_t - mean[torch.from_numpy(cell)]
        center = np.stack([u, v], -1).astype(np.float64) * sizes[:2] + sizes[:2] / 2 + rmin[:2]
        f_center = torch.from_numpy((pos3[:, :2] - center).astype(np.float32))
        tail = torch.from_numpy(p[:, 3:].astype(np.float32))
        return torch.cat([pos3_t, tail, f_cluster, f_center], dim=1)

    feat_p = decorate(p[:, :3], up, vp, pid, hp * wp, vs, pc)
    feat_c = decorate(np.stack([phi, p[:, 2], rho], -1), uc, vc, cid, hc * wc, cs, cyl)
    fused = torch.cat([feat_p, feat_c], dim=1)
    pos_p = np.stack([(p[:, 0] - pc[0]) / vs[0], (p[:, 1] - pc[1]) / vs[1]], -1)
    pos_c = np.stack([(phi - cyl[0]) / cs[0], (p[:, 2] - cyl[1]) / cs[1]], -1)

    with torch.no_grad():
        pv = tm_pillar(fused, pid, hp * wp, (hp, wp), pos_p)
        cv = tm_cyl(fused, cid, hc * wc, (hc, wc), pos_c)
        pw = tm_p2(torch.cat([tm_p1(fused), pv, cv], dim=1))
        ds = int(np.prod(STRIDES))
        ho, wo = hp // ds, wp // ds
        coarse = (vp // ds) * wo + (up // ds)
        bev = torch.zeros((ho * wo, OUT_CH))
        bev.index_reduce_(0, torch.from_numpy(coarse), pw, "amax", include_self=True)
        bev_t = bev.reshape(ho, wo, OUT_CH).numpy()

    np.testing.assert_allclose(bev_t, bev_jax[0], rtol=2e-3, atol=2e-3)

"""PyTorch -> JAX weight-import validation (numeric, against torch CPU)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from flax import linen as nn

from pillarnext_tpu.utils import torch_import as ti


class TestLayerConversions:
    def test_linear(self):
        lin = torch.nn.Linear(11, 32, bias=False)
        x = np.random.default_rng(0).uniform(-1, 1, (7, 11)).astype(np.float32)
        ref = lin(torch.from_numpy(x)).detach().numpy()

        dense = nn.Dense(32, use_bias=False)
        kernel = ti.linear_kernel(lin.weight.detach().numpy())
        out = dense.apply({"params": {"kernel": jnp.asarray(kernel)}}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_conv2d(self):
        conv = torch.nn.Conv2d(8, 16, 3, padding=1, bias=True)
        x = np.random.default_rng(1).uniform(-1, 1, (2, 8, 12, 12)).astype(np.float32)
        ref = conv(torch.from_numpy(x)).detach().numpy()  # NCHW

        flax_conv = nn.Conv(16, (3, 3), padding="SAME", use_bias=True)
        kernel = ti.conv_kernel(conv.weight.detach().numpy(), in_channels=8)
        out = flax_conv.apply(
            {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(conv.bias.detach().numpy())}},
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        )
        np.testing.assert_allclose(
            np.transpose(np.asarray(out), (0, 3, 1, 2)), ref, atol=1e-4
        )

    def test_spconv_layout_detected(self):
        # spconv 2.x stores (O, H, W, I); ensure detection by channel match
        w_ohwi = np.random.default_rng(2).uniform(-1, 1, (16, 3, 3, 8)).astype(np.float32)
        k = ti.conv_kernel(w_ohwi, in_channels=8)
        assert k.shape == (3, 3, 8, 16)
        w_oihw = np.transpose(w_ohwi, (0, 3, 1, 2))
        k2 = ti.conv_kernel(w_oihw, in_channels=8)
        np.testing.assert_array_equal(k, k2)

    def test_conv_transpose(self):
        deconv = torch.nn.ConvTranspose2d(8, 16, kernel_size=2, stride=2, bias=False)
        x = np.random.default_rng(3).uniform(-1, 1, (2, 8, 6, 6)).astype(np.float32)
        ref = deconv(torch.from_numpy(x)).detach().numpy()

        flax_deconv = nn.ConvTranspose(16, (2, 2), strides=(2, 2), padding="VALID", use_bias=False)
        kernel = ti.conv_transpose_kernel(deconv.weight.detach().numpy())
        out = flax_deconv.apply(
            {"params": {"kernel": jnp.asarray(kernel)}},
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        )
        np.testing.assert_allclose(
            np.transpose(np.asarray(out), (0, 3, 1, 2)), ref, atol=1e-4
        )

    def test_batchnorm_eval(self):
        bn = torch.nn.BatchNorm2d(8, eps=1e-3, momentum=0.01)
        bn.eval()
        with torch.no_grad():
            bn.weight.uniform_(0.5, 1.5)
            bn.bias.uniform_(-0.5, 0.5)
            bn.running_mean.uniform_(-1, 1)
            bn.running_var.uniform_(0.5, 2.0)
        x = np.random.default_rng(4).uniform(-2, 2, (2, 8, 5, 5)).astype(np.float32)
        ref = bn(torch.from_numpy(x)).detach().numpy()

        flax_bn = nn.BatchNorm(use_running_average=True, epsilon=1e-3, momentum=0.99)
        variables = {
            "params": {
                "scale": jnp.asarray(bn.weight.detach().numpy()),
                "bias": jnp.asarray(bn.bias.detach().numpy()),
            },
            "batch_stats": {
                "mean": jnp.asarray(bn.running_mean.numpy()),
                "var": jnp.asarray(bn.running_var.numpy()),
            },
        }
        out = flax_bn.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
        np.testing.assert_allclose(
            np.transpose(np.asarray(out), (0, 3, 1, 2)), ref, atol=1e-5
        )


def _fake_reference_state_dict(tasks, common_heads):
    """Random tensors with the reference model's exact key set/shapes
    (pillarnet18_aspp, nuScenes experiment geometry, spconv OHWI layout)."""
    rng = np.random.default_rng(0)
    sd = {}

    def t(*shape):
        return rng.normal(0, 0.05, shape).astype(np.float32)

    def add_bn(prefix, c):
        sd[f"{prefix}.weight"] = t(c)
        sd[f"{prefix}.bias"] = t(c)
        sd[f"{prefix}.running_mean"] = t(c)
        sd[f"{prefix}.running_var"] = np.abs(t(c)) + 1.0
        sd[f"{prefix}.num_batches_tracked"] = np.asarray(1)

    # reader: 10 -> 32(+max concat -> 64) -> 64
    sd["reader.pfn_layers.0.linear.weight"] = t(32, 10)
    add_bn("reader.pfn_layers.0.norm", 32)
    sd["reader.pfn_layers.1.linear.weight"] = t(64, 64)
    add_bn("reader.pfn_layers.1.norm", 64)

    # backbone (spconv OHWI)
    filters = [64, 128, 256, 256]
    in_ch = 64
    for s in range(4):
        sd[f"backbone.blocks.{s}.0.conv.weight"] = t(filters[s], 3, 3, in_ch)
        add_bn(f"backbone.blocks.{s}.0.norm", filters[s])
        in_ch = filters[s]
        for b in (1, 2):
            sd[f"backbone.blocks.{s}.{b}.block1.conv.weight"] = t(in_ch, 3, 3, in_ch)
            add_bn(f"backbone.blocks.{s}.{b}.block1.norm", in_ch)
            sd[f"backbone.blocks.{s}.{b}.conv2.weight"] = t(in_ch, 3, 3, in_ch)
            add_bn(f"backbone.blocks.{s}.{b}.norm2", in_ch)
    sd["backbone.mapping.0.weight"] = t(256, 1, 1, 256)
    add_bn("backbone.mapping.1", 256)

    # neck
    for b in (1, 2):
        sd[f"neck.pre_conv.block{b}.conv.weight"] = t(256, 256, 3, 3)
        add_bn(f"neck.pre_conv.block{b}.norm", 256)
    sd["neck.conv1x1.weight"] = t(256, 256, 1, 1)
    sd["neck.weight"] = t(256, 256, 3, 3)
    sd["neck.post_conv.conv.weight"] = t(256, 1536, 1, 1)
    add_bn("neck.post_conv.norm", 256)

    # head
    sd["head.shared_conv.0.weight"] = t(64, 256, 3, 3)
    sd["head.shared_conv.0.bias"] = t(64)
    add_bn("head.shared_conv.1", 64)
    for ti_, task in enumerate(tasks):
        sd[f"head.tasks.{ti_}.deblock.conv.weight"] = t(64, 64, 2, 2)
        add_bn(f"head.tasks.{ti_}.deblock.norm", 64)
        branches = dict(common_heads)
        branches["hm"] = (len(task), 2)
        for name, (n_out, n_conv) in branches.items():
            for li in range(n_conv - 1):
                sd[f"head.tasks.{ti_}.{name}.{3 * li}.weight"] = t(64, 64, 3, 3)
                sd[f"head.tasks.{ti_}.{name}.{3 * li}.bias"] = t(64)
                add_bn(f"head.tasks.{ti_}.{name}.{3 * li + 1}", 64)
            fi = 3 * (n_conv - 1)
            sd[f"head.tasks.{ti_}.{name}.{fi}.weight"] = t(n_out, 64, 3, 3)
            sd[f"head.tasks.{ti_}.{name}.{fi}.bias"] = t(n_out)
    return sd


class TestExportRoundTrip:
    def test_export_inverts_import_bit_exact(self):
        """export_pillarnext(import_pillarnext(sd)) == sd (bit-exact).

        Guards the flax->torch direction used to push TPU-trained weights
        into the torch mirror for trained-weight flagship parity."""
        tasks = [["car"], ["truck", "construction_vehicle"], ["bus", "trailer"],
                 ["barrier"], ["motorcycle", "bicycle"],
                 ["pedestrian", "traffic_cone"]]
        common = {"reg": (2, 2), "height": (1, 2), "dim": (3, 2),
                  "rot": (2, 2), "vel": (2, 2)}
        sd = _fake_reference_state_dict(tasks, common)
        params, stats = ti.import_pillarnext(sd, tasks=tasks, common_heads=common)
        back = ti.export_pillarnext(
            params, stats, tasks=tasks, common_heads=common
        )
        # same key set (the fake sd uses spconv OHWI for the backbone; export
        # emits torch OIHW, so values are compared on the flax side below)
        expected = {k for k in sd if not k.endswith("num_batches_tracked")}
        assert set(back) == expected, (
            sorted(expected - set(back))[:5], sorted(set(back) - expected)[:5]
        )
        params2, stats2 = ti.import_pillarnext(
            back, tasks=tasks, common_heads=common
        )
        flat1 = jax.tree_util.tree_flatten_with_path((params, stats))[0]
        flat2 = jax.tree_util.tree_flatten_with_path((params2, stats2))[0]
        assert len(flat1) == len(flat2)
        for (k1, v1), (k2, v2) in zip(flat1, flat2):
            assert k1 == k2
            np.testing.assert_array_equal(
                np.asarray(v1), np.asarray(v2),
                err_msg=jax.tree_util.keystr(k1),
            )


class TestFullImport:
    def test_structure_and_shapes_match_flax_init(self):
        from pillarnext_tpu.utils import builders
        from pillarnext_tpu.utils.config import load_experiment
        from pathlib import Path

        cfg = load_experiment(
            Path(__file__).resolve().parent.parent
            / "pillarnext_tpu/configs/experiments/nusc_det_pp18_aspp_iou_sp.yaml",
            overrides=[
                "model.reader.voxel_size=[0.6, 0.6, 8]",
                "model.reader.pc_range=[-9.6, -9.6, -5.0, 9.6, 9.6, 3.0]",
                "model.dtype=float32",
            ],
        )
        model = builders.build_model(cfg["model"])
        tasks = cfg["_tasks"]
        common = {k: tuple(v) for k, v in cfg["model"]["head"]["common_heads"].items()}

        sd = _fake_reference_state_dict(tasks, common)
        params, stats = ti.import_pillarnext(
            sd, tasks=tasks, common_heads=common
        )

        pts = jnp.zeros((1, 64, 5), jnp.float32)
        mask = jnp.ones((1, 64), bool)
        ti.validate_against_flax(params, stats, model, pts, mask)

        # imported model actually runs
        variables = {
            "params": jax.tree.map(jnp.asarray, params),
            "batch_stats": jax.tree.map(jnp.asarray, stats),
        }
        preds = model.apply(variables, pts, mask)
        assert preds[0]["hm"].shape[-1] == 1
        assert np.isfinite(np.asarray(preds[0]["reg"])).all()

"""End-to-end CLI smoke test: tools/train.py + tools/test.py on a synthetic
mini nuScenes tree (subprocess — the real user surface)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from tests.test_data_pipeline import make_mini_nuscenes

REPO = Path(__file__).resolve().parent.parent


def _overrides(root):
    return [
        f"data.train_dataset.root_path={root}",
        "data.train_dataset.info_path=infos.pkl",
        "data.val_dataset.info_path=infos.pkl",
        "data.train_dataset.resampling=false",
        "data.train_dataset.sampler.dbinfo_path=dbinfos.pkl",
        "data.train_dataset.prepare_label.centermap.max_objs=20",
        # shrink the model to a 64x64 grid
        "model.reader.voxel_size=[0.4, 0.4, 8]",
        "model.reader.pc_range=[-12.8, -12.8, -5.0, 12.8, 12.8, 3.0]",
        "model.backbone.ds_num_filters=[16, 16, 32, 32]",
        "model.backbone.layer_nums=[1, 1, 1, 1]",
        "model.post_processing.nms.nms_pre_max_size=64",
        "model.post_processing.nms.nms_post_max_size=8",
        "model.post_processing.post_center_limit_range=[-15, -15, -10, 15, 15, 10]",
        "dataloader.train.batch_size=2",
        "dataloader.val.batch_size=2",
        "dataloader.train.num_workers=0",
        "dataloader.val.num_workers=0",
        "dataloader.max_points=3000",
        "trainer.max_epochs=1",
        "scheduler.max_lr=0.001",
    ]


@pytest.mark.slow
def test_train_then_test_cli(tmp_path):
    root = tmp_path / "nusc"
    make_mini_nuscenes(root, n_samples=4, n_points=700)
    work = tmp_path / "work"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    # this environment's sitecustomize rewrites XLA_FLAGS inside the child,
    # so the count must also travel via the CLI's own env knob
    env["PNX_CPU_DEVICES"] = "1"
    env["PYTHONPATH"] = str(REPO)

    cmd = [
        sys.executable,
        str(REPO / "tools/train.py"),
        "--config",
        str(REPO / "pillarnext_tpu/configs/experiments/nusc_det_pp18_aspp_iou_sp.yaml"),
        "--work-dir",
        str(work),
    ] + _overrides(root)
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=900, cwd=tmp_path, env=env)
    assert r.returncode == 0, r.stderr[-3000:]

    # checkpoint written, eval artifacts produced
    assert (work / "checkpoints" / "epoch_1").exists()
    res_json = work / "results" / "epoch_1" / "results_nusc.json"
    assert res_json.exists()
    sub = json.loads(res_json.read_text())
    assert len(sub["results"]) == 4
    assert (work / "results" / "epoch_1" / "metrics_summary.json").exists()

    # eval CLI against the produced checkpoint
    cmd = [
        sys.executable,
        str(REPO / "tools/test.py"),
        "--config",
        str(REPO / "pillarnext_tpu/configs/experiments/nusc_det_pp18_aspp_iou_sp.yaml"),
        "--checkpoint",
        str(work / "checkpoints" / "epoch_1"),
        "--work-dir",
        str(tmp_path / "work2"),
    ] + _overrides(root)
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=900, cwd=tmp_path, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    assert (tmp_path / "work2" / "results" / "epoch_1" / "results_nusc.json").exists()

"""Synthetic LiDAR-like point clouds for benchmarks and probes.

Real spinning-LiDAR returns are BEAM-STRUCTURED: points concentrate on
surfaces (ground ring, walls, vehicles), so a multi-sweep nuScenes frame of
~200-300k points occupies only ~40-60k pillars of the 1344^2 x 0.075 m grid
(~3%).  A uniform or purely radial spray occupies 3-4x more pillars and
overstates reader/sparse-conv/NMS cost (or understates it for dense convs).

The generator clusters points on ~n/10 surface patches (vertical surfaces stack many beams into one pillar) with ~2.5 cm lateral
spread (matching the real ~4-5 points/pillar of 10-sweep aggregation) plus
a diffuse 5% background, radial density following the range falloff of
returns; at 200k points this occupies ~55k pillars of the flagship grid.
"""

from __future__ import annotations

import numpy as np


def lidar_like_points(
    batch: int,
    n_points: int,
    pc_range,
    seed: int = 0,
    points_per_surface: int = 10,
):
    """(B, N, 5) [x, y, z, intensity, dt] float32 + (B, N) bool mask."""
    rng = np.random.default_rng(seed)
    r_max = float(min(pc_range[3], -pc_range[0])) - 0.5
    pts = np.zeros((batch, n_points, 5), np.float32)
    n_bg = n_points // 20
    n_fg = n_points - n_bg
    n_centers = max(n_fg // points_per_surface, 1)
    for b in range(batch):
        # surface patches: radial falloff like real returns
        cr = np.minimum(np.abs(rng.gamma(2.0, 9.0, n_centers)), r_max)
        cth = rng.uniform(-np.pi, np.pi, n_centers)
        cz = rng.normal(-1.2, 0.6, n_centers)
        cidx = rng.integers(0, n_centers, n_fg)
        x = cr[cidx] * np.cos(cth[cidx]) + rng.normal(0, 0.025, n_fg)
        y = cr[cidx] * np.sin(cth[cidx]) + rng.normal(0, 0.025, n_fg)
        z = cz[cidx] + rng.normal(0, 0.25, n_fg)
        # diffuse background (clutter, long-range singles)
        br = np.minimum(np.abs(rng.gamma(2.0, 9.0, n_bg)), r_max)
        bth = rng.uniform(-np.pi, np.pi, n_bg)
        pts[b, :, 0] = np.concatenate([x, br * np.cos(bth)])
        pts[b, :, 1] = np.concatenate([y, br * np.sin(bth)])
        pts[b, :, 2] = np.clip(
            np.concatenate([z, rng.normal(-1.2, 0.8, n_bg)]),
            pc_range[2] + 0.05,
            pc_range[5] - 0.05,
        )
        pts[b, :, 3] = rng.uniform(0, 1, n_points)
        pts[b, :, 4] = rng.uniform(0, 0.45, n_points)
    return pts, np.ones((batch, n_points), bool)

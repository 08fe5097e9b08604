"""Correctness of the segmented broadcast-reduce scan (interpret mode, CPU).

Contract (ops/pallas_segscan.py): for non-decreasing seg,
``sorted_segment_bcast(x, seg, reduce=r)`` equals
``segment_<r>(x, seg)[seg]``.  Adversarial cases: segments straddling tile
boundaries, single giant segment, all-singleton segments, ragged tails,
bf16, and the PFN production shape (points sorted by pillar slot with a
trailing dump segment).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from pillarnext_tpu.ops.pallas_segscan import T, sorted_segment_bcast


def reference(x, seg, reduce):
    out = np.zeros_like(x)
    for s in np.unique(seg):
        m = seg == s
        out[m] = x[m].max(0) if reduce == "max" else x[m].sum(0)
    return out


def run(x, seg, reduce, tol=0.0):
    got = np.asarray(
        sorted_segment_bcast(
            jnp.asarray(x), jnp.asarray(seg), reduce=reduce, interpret=True
        ),
        np.float32,
    )
    want = reference(np.asarray(x, np.float32), seg, reduce)
    if tol:
        np.testing.assert_allclose(got, want, rtol=tol, atol=tol)
    else:
        np.testing.assert_array_equal(got, want)


def segments(rng, n, avg_len):
    seg = np.cumsum(rng.random(n) < 1.0 / avg_len).astype(np.int32)
    return seg


@pytest.mark.parametrize("reduce", ["max", "sum"])
@pytest.mark.parametrize("n,avg", [(1000, 5), (T * 3 + 17, 40), (T * 2, 1)])
def test_random_segments(reduce, n, avg):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, 16)).astype(np.float32)
    # sum of ~5 floats: scan order differs from XLA's -> tiny fp tolerance
    run(x, segments(rng, n, avg), reduce, tol=1e-5 if reduce == "sum" else 0.0)


@pytest.mark.parametrize("reduce", ["max", "sum"])
def test_one_giant_segment(reduce):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((T * 4 + 3, 8)).astype(np.float32)
    seg = np.zeros(len(x), np.int32)
    run(x, seg, reduce, tol=1e-4 if reduce == "sum" else 0.0)


def test_boundary_straddle_max():
    # one segment exactly covering rows [T-3, T+5): carry must flow
    rng = np.random.default_rng(2)
    x = rng.standard_normal((T * 2, 4)).astype(np.float32)
    seg = np.arange(T * 2, dtype=np.int32)
    seg[T - 3 : T + 5] = seg[T - 3]
    seg = np.minimum.accumulate(seg[::-1])[::-1]  # keep non-decreasing
    seg = np.maximum.accumulate(seg)
    run(x, seg, "max")


def test_pfn_production_shape_bf16():
    rng = np.random.default_rng(3)
    n = 3000
    x = jnp.asarray(rng.standard_normal((n, 32)), jnp.bfloat16)
    seg = segments(rng, n - 100, 5)
    seg = np.concatenate([seg, np.full(100, 10_000, np.int32)])  # dump tail
    got = np.asarray(
        sorted_segment_bcast(x, jnp.asarray(seg), reduce="max", interpret=True),
        np.float32,
    )
    want = reference(np.asarray(x, np.float32), seg, "max")
    np.testing.assert_array_equal(got, want)  # max in bf16 is exact

"""Radix-select exact top-k (ops/topk.py) is bit-identical to lax.top_k —
values, indices, and tie order — on NMS-lane-shaped inputs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pillarnext_tpu.ops.topk import exact_top_k


@pytest.mark.parametrize(
    "l,n,k",
    [(4, 5000, 100), (2, 113_000, 1000), (3, 64, 8), (1, 100, 100)],
)
def test_matches_lax_top_k(l, n, k):
    rng = np.random.default_rng(l * n + k)
    x = rng.normal(size=(l, n)).astype(np.float32)
    # the predict path demotes ~95% of the lane to NEG_INF and scores tie
    x[rng.uniform(size=x.shape) < 0.8] = -1e18
    x[0, : min(50, n)] = 0.25
    xs = jnp.asarray(x)
    v1, i1 = jax.jit(lambda s: jax.lax.top_k(s, k))(xs)
    v2, i2 = jax.jit(lambda s: exact_top_k(s, k))(xs)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_infs_and_negatives():
    rng = np.random.default_rng(7)
    x = np.concatenate(
        [
            rng.normal(size=(2, 500)),
            np.full((2, 8), np.inf),
            np.full((2, 8), -np.inf),
        ],
        axis=1,
    ).astype(np.float32)
    v1, i1 = jax.lax.top_k(jnp.asarray(x), 40)
    v2, i2 = exact_top_k(jnp.asarray(x), 40)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

"""Correctness of the windowed Pallas row gather (interpret mode, CPU).

The production contract (`ops/pallas_gather.py`): for index streams whose
real (< R) entries are non-decreasing with per-T-tile span < T, and whose
other entries are sentinels >= R, the kernel is bit-identical to
``where(idx < R, table[clip(idx)], 0)``.  These tests build adversarial
streams at that contract's edges: all-sentinel tiles, tiles straddling
window boundaries, ragged tails, bf16 tables, span == T-1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pillarnext_tpu.ops.pallas_gather import T, monotone_row_gather


def reference(table: np.ndarray, idx: np.ndarray) -> np.ndarray:
    r = table.shape[0]
    safe = np.clip(idx, 0, r - 1)
    out = table[safe]
    out[idx >= r] = 0
    return out


def run(table: np.ndarray, idx: np.ndarray) -> None:
    got = np.asarray(
        monotone_row_gather(jnp.asarray(table), jnp.asarray(idx), interpret=True)
    )
    want = reference(table, idx)
    np.testing.assert_array_equal(got, want)


def monotone_stream(rng, m: int, r: int, sentinel_frac: float) -> np.ndarray:
    """Non-decreasing real entries with span < T in any window of T, plus
    sentinels (== r) scattered anywhere (densify's dump-slot pattern)."""
    is_real = rng.random(m) >= sentinel_frac
    n_real = int(is_real.sum())
    # real entries: non-decreasing, and by construction any T consecutive
    # real entries span <= their count (steps of 0/1), mimicking compact
    # slot assignment in ascending dense order.
    steps = rng.integers(0, 2, n_real)
    reals = np.minimum(np.cumsum(steps), r - 1)
    idx = np.full(m, r, np.int64)
    idx[is_real] = reals
    return idx.astype(np.int32)


@pytest.mark.parametrize("dtype", [np.float32, np.bfloat16 if hasattr(np, "bfloat16") else np.float32])
@pytest.mark.parametrize("m,r,c", [(2048, 700, 64), (T * 3 + 17, T + 3, 8)])
def test_mixed_sentinels(dtype, m, r, c):
    rng = np.random.default_rng(0)
    table = rng.standard_normal((r, c)).astype(np.float32)
    if dtype != np.float32:
        table = table.astype(jnp.bfloat16)
    run(np.asarray(table), monotone_stream(rng, m, r, 0.4))


def test_all_sentinel_tiles():
    rng = np.random.default_rng(1)
    table = rng.standard_normal((300, 16)).astype(np.float32)
    idx = np.full(T * 4, 300, np.int32)  # every tile fully sentinel
    idx[: T // 2] = np.arange(T // 2)  # except a ragged real prefix
    run(table, idx)


def test_full_span_tile():
    # a tile whose real entries span exactly T-1 rows straddling a window
    # block boundary: base = min // T must still cover max < base*T + 2T.
    rng = np.random.default_rng(2)
    r = T * 3
    table = rng.standard_normal((r, 32)).astype(np.float32)
    start = T - 7  # min lands near the end of block 0 -> window [0, 2T)
    idx = (start + np.arange(T)).astype(np.int32)  # span T-1
    idx = np.concatenate([idx, np.full(13, r, np.int32)])  # ragged tail
    run(table, idx)


def test_short_stream_and_exact_multiple():
    rng = np.random.default_rng(3)
    table = rng.standard_normal((50, 4)).astype(np.float32)
    run(table, np.array([0, 0, 1, 5, 49, 50], np.int32))  # m < T
    run(table, monotone_stream(rng, T * 2, 50, 0.2))  # m % T == 0


def test_bf16_bit_exact():
    rng = np.random.default_rng(4)
    table = jnp.asarray(rng.standard_normal((400, 64)), jnp.bfloat16)
    idx = monotone_stream(rng, 1000, 400, 0.3)
    got = monotone_row_gather(table, jnp.asarray(idx), interpret=True)
    want = jnp.where(
        (idx < 400)[:, None], table[np.clip(idx, 0, 399)], jnp.bfloat16(0)
    )
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


def test_production_shapes_contract():
    """densify's real stream: slots assigned in ascending dense order."""
    rng = np.random.default_rng(5)
    rows, cap = 8192, 900
    active = np.sort(rng.choice(rows, cap, replace=False))
    slot_of_dense = np.full(rows, cap, np.int32)
    slot_of_dense[active] = np.arange(cap)
    table = rng.standard_normal((cap, 24)).astype(np.float32)
    run(table, slot_of_dense)

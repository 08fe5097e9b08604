import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp, numpy as np
from pillarnext_tpu.core import jax_box_ops
from pillarnext_tpu.ops.pallas_iou import boxes_iou_bev_pallas

rng = np.random.default_rng(0)
K = 256
boxes = np.zeros((K, 7), np.float32)
boxes[:, :2] = rng.uniform(-50, 50, (K, 2))
boxes[:, 3:6] = rng.uniform(0.5, 6, (K, 3))
boxes[:, 6] = rng.uniform(-np.pi, np.pi, K)
b = jnp.asarray(boxes)

r_pl = boxes_iou_bev_pallas(b, b)
r_xla = jax_box_ops.boxes_iou_bev(b, b)
err = float(jnp.abs(r_pl - r_xla).max())
print(f"max abs err pallas vs xla on TPU: {err:.2e}", flush=True)

def bench(name, fn, arr, k=20):
    _ = np.asarray(jnp.ravel(fn(arr, arr))[:1])
    t0 = time.perf_counter()
    outs = [fn(arr, arr) for _ in range(k)]
    _ = np.asarray(jnp.ravel(outs[-1])[:1])
    n = arr.shape[0]
    print(f"{name}: {(time.perf_counter()-t0)/k*1000:.2f} ms for {n}x{n}", flush=True)

bench("xla   ", jax_box_ops.boxes_iou_bev, b)
bench("pallas", boxes_iou_bev_pallas, b)
big = jnp.concatenate([b, b, b, b], axis=0)  # 1024 rows
bench("pallas", boxes_iou_bev_pallas, big)

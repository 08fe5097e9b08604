"""One rank of the 2-process multi-host eval-gather test.

Launched by tests/test_multihost_eval_gather.py as a subprocess:

    python tests/multihost_eval_worker.py <rank> <nproc> <port> <workdir>

Each rank runs Trainer.val_epoch on its OWN shard of a synthetic val set
(distinct tokens per rank), which drives the ``jax.process_count() > 1``
filesystem-shard gather branch of train/trainer.py (the TPU-pod analogue of
the reference's ``dist.all_gather_object``,
/root/reference/trainer/trainer/trainer.py:160-174).  Rank 0's
``dataset.evaluation`` must then see BOTH ranks' detections; it records what
it scored to ``<workdir>/scored.json`` for the parent test to assert on.
"""

import json
import os
import sys
from pathlib import Path

rank = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
workdir = Path(sys.argv[4])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", num_processes=nproc, process_id=rank)
assert jax.process_count() == nproc, jax.process_count()

import numpy as np  # noqa: E402

from pillarnext_tpu.parallel import mesh as mesh_lib  # noqa: E402
from pillarnext_tpu.train import train_state as ts_lib  # noqa: E402
from pillarnext_tpu.train.trainer import Trainer  # noqa: E402
from pillarnext_tpu.utils import builders  # noqa: E402
from tests.test_val_overflow_repair import model_cfg, one_batch  # noqa: E402


class _ShardLoader:
    """Each rank's private val shard; ``evaluation`` runs on rank 0 only,
    AFTER the fs gather, so it must see every rank's tokens."""

    def __init__(self, batch, nproc):
        self.batch = batch
        self.nproc = nproc
        self.dataset = self

    def __len__(self):
        return 1

    def __iter__(self):
        yield dict(self.batch)

    def evaluation(self, results, output_dir):
        per_token = {
            tok: int(np.asarray(r["box3d_lidar"]).shape[0])
            for tok, r in sorted(results.items())
        }
        with open(workdir / "scored.json", "w") as f:
            json.dump(
                {
                    "scoring_rank": jax.process_index(),
                    "n_results": len(results),
                    "boxes_per_token": per_token,
                },
                f,
            )
        return {"n_results": len(results)}


def main():
    # rank-specific scene + tokens; capacity ample so eval never overflows
    batch = one_batch(batch=2, n_points=3000, seed=100 + rank)
    batch["token"] = [f"r{rank}_{t}" for t in batch["token"]]
    cfg = model_cfg(8192)

    model = builders.build_model(cfg)
    tx, _ = ts_lib.make_optimizer(max_lr=1e-3, total_steps=4)
    loader = _ShardLoader(batch, nproc)
    tr = Trainer(
        model,
        val_dataloader=loader,
        optimizer=tx,
        work_dir=str(workdir),
        mesh=mesh_lib.make_mesh(jax.local_devices()),
        eval_overflow="raise",
    )
    # identical init on every rank (same seed): replicated-params semantics
    tr.init_state({k: v for k, v in batch.items() if k != "token"})
    result = tr.val_epoch()
    if rank == 0:
        assert result == {"n_results": 2 * nproc}, result
    else:
        assert result is None, result
    print(f"rank={rank} ok", flush=True)


if __name__ == "__main__":
    main()

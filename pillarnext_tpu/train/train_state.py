"""Training state + jitted step builders.

The reference splits optimization across Trainer.optimize_step
(zero_grad/backward/clip/step/scheduler-step-per-iteration,
trainer/trainer/trainer.py:94-108) and torch AdamW/OneCycleLR configs.  Here
the whole update is one compiled function: loss + grad (+ global-batch BN
stat update), global-norm clip, AdamW with the OneCycle schedule baked in as
an optax schedule, all under ``jit`` over the data mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pillarnext_tpu.parallel import mesh as mesh_lib


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def flatten_telemetry(tel) -> dict:
    """Flax 'telemetry' collection (nested module dicts of sown 1-tuples) ->
    flat {leaf_name: scalar}.  Names are unique across the model (readers/
    backbones use distinct keys), so the module path is dropped."""
    flat = {}

    def walk(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if isinstance(v, dict):
                    walk(v)
                else:
                    seq = v if isinstance(v, (tuple, list)) else (v,)
                    flat[k] = seq[0] if len(seq) == 1 else jnp.stack(seq).max()

    walk(tel)
    return flat


def overflow_total(tel_flat: dict):
    """Sum of all *_overflow counters (0 when the model sows none)."""
    vals = [v for k, v in tel_flat.items() if k.endswith("_overflow")]
    return sum(vals) if vals else jnp.zeros((), jnp.int32)


def make_optimizer(
    max_lr: float,
    total_steps: int,
    *,
    betas=(0.9, 0.99),
    weight_decay: float = 0.01,
    div_factor: float = 10.0,
    pct_start: float = 0.4,
    final_div_factor: float = 1e4,
    clip_grad_val: float = 35.0,
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """AdamW + OneCycle (reference configs/optimizer/adamW.yaml,
    configs/scheduler/onecycle.yaml; torch OneCycleLR cos-anneal defaults)."""
    schedule = optax.cosine_onecycle_schedule(
        transition_steps=total_steps,
        peak_value=max_lr,
        pct_start=pct_start,
        div_factor=div_factor,
        final_div_factor=final_div_factor,
    )
    components = []
    if clip_grad_val and clip_grad_val > 0:
        components.append(optax.clip_by_global_norm(clip_grad_val))
    components.append(
        optax.adamw(schedule, b1=betas[0], b2=betas[1], weight_decay=weight_decay)
    )
    return optax.chain(*components), schedule


def create_train_state(model, example, rng, tx) -> TrainState:
    variables = model.init(rng, example["points"], example["points_mask"])
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )


def make_train_step(model, tx, mesh, donate: bool = True, accum_steps: int = 1) -> Callable:
    """Compiled train step: state (replicated), batch (data-sharded) ->
    (state, logs).

    ``accum_steps > 1`` enables gradient accumulation (absent in the
    reference, SURVEY.md §2.7): the batch's leading dim is split into
    micro-batches scanned sequentially, gradients averaged, one optimizer
    update.  BN statistics update per micro-batch (running-average
    semantics).  Use to reach the reference's effective batch when the
    full-resolution backward does not fit HBM at the target per-device batch.
    """

    def loss_and_grad(params, batch_stats, batch):
        def loss_fn(p):
            (loss, logs), mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                batch,
                train=True,
                method=model.loss,
                mutable=["batch_stats", "telemetry"],
            )
            tel = flatten_telemetry(mutated.get("telemetry", {}))
            return loss, (logs, mutated["batch_stats"], tel)

        (loss, (logs, new_bs, tel)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        return loss, logs, new_bs, tel, grads

    def step_fn(state: TrainState, batch) -> tuple[TrainState, Any]:
        if accum_steps == 1:
            loss, logs, new_bs, tel, grads = loss_and_grad(
                state.params, state.batch_stats, batch
            )
        else:
            micro = jax.tree.map(
                lambda x: x.reshape(
                    accum_steps, x.shape[0] // accum_steps, *x.shape[1:]
                ),
                batch,
            )
            grads0 = jax.tree.map(jnp.zeros_like, state.params)

            def scan_body(carry, mb):
                bs, acc, loss_acc = carry
                loss, logs, nbs, tel, grads = loss_and_grad(state.params, bs, mb)
                acc = jax.tree.map(jnp.add, acc, grads)
                return (nbs, acc, loss_acc + loss), (logs, tel)

            (new_bs, grads, loss_sum), (logs, tel) = jax.lax.scan(
                scan_body, (state.batch_stats, grads0, 0.0), micro
            )
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
            loss = loss_sum / accum_steps
            logs = jax.tree.map(lambda x: x.mean(axis=0), logs)
            tel = jax.tree.map(lambda x: x.max(axis=0), tel)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        scalar_logs = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            # capacity telemetry: any nonzero *_overflow means active sites
            # were silently dropped this step (undersized pillar_capacity /
            # stage capacity) — the trainer raises on it
            "overflow": overflow_total(tel),
            "telemetry": tel,
        }
        return new_state, (scalar_logs, logs)

    # shardings are inferred from input placement: state arrives replicated,
    # the batch data-sharded; outputs inherit.  (An explicit out_shardings
    # spec here forced a per-step reshard that cost ~10x the step itself.)
    del mesh
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(model, mesh) -> Callable:
    """Compiled predict step: variables (replicated), batch (data-sharded) ->
    (fixed-size detections, flat capacity-telemetry dict)."""

    def step_fn(variables, batch):
        dets, mutated = model.apply(
            variables, batch, method=model.predict, mutable=["telemetry"]
        )
        return dets, flatten_telemetry(mutated.get("telemetry", {}))

    return jax.jit(step_fn)

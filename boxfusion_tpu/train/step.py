"""Jitted, mesh-shardable training step for CuTR.

The reference ships no trainer (SURVEY.md section 1); this provides the
production-framework counterpart: an optax AdamW step over the full model
(all heads supervised via the set loss, with deep supervision over the
decoder's intermediate layers) that jits cleanly under a
``jax.sharding.Mesh`` with dp/fsdp/tp shardings (see parallel/mesh.py).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from boxfusion_tpu.models.cutr.model import CubifyTransformer, FrameBatch
from boxfusion_tpu.train.loss import detection_loss


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.step), None),
    lambda aux, leaves: TrainState(*leaves),
)


def make_train_step(
    model: CubifyTransformer,
    learning_rate: float = 1e-4,
    weight_decay: float = 1e-4,
) -> tuple[Callable, optax.GradientTransformation]:
    """Returns (train_step, optimizer).

    train_step(state, batch: FrameBatch, targets) -> (state, metrics);
    targets is a dict of (B, G, ...) arrays (see train/loss.py).
    """
    tx = optax.adamw(learning_rate, weight_decay=weight_decay)

    def loss_fn(params, batch: FrameBatch, targets):
        out = model.apply(params, batch, train=True)
        S = batch.image.shape[1]

        def per_image(pred_b, tgt_b):
            return detection_loss(pred_b, tgt_b, float(S))["total"]

        total = 0.0
        # deep supervision over every decoder layer (the reference model
        # refines boxes layer by layer, cubify_transformer.py:330-349).
        for inter in out["intermediates"]:
            pred = dict(
                logits=inter["logits"],
                boxes=inter["boxes"],
                proj_xy=inter["proj_xy"],
                z_scaled=inter["z_scaled"],
                dims=inter["dims"],
                pose=inter["pose"],
            )
            total = total + jnp.mean(jax.vmap(per_image)(pred, targets))
        return total / len(out["intermediates"])

    def train_step(state: TrainState, batch: FrameBatch, targets):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, targets)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            {"loss": loss},
        )

    return train_step, tx


def init_train_state(params, tx) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.int32(0))

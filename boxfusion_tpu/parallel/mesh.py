"""Device mesh + sharding rules (dp / fsdp / tp) for CuTR training & eval.

The reference has **no distributed runtime at all** (SURVEY.md section 2
checklist: no torch.distributed, no NCCL, single device); this module is
the TPU-native scaling layer the new framework adds on top of parity:

  * mesh axes ("dp", "fsdp", "tp"): data parallel, fully-sharded parameter
    storage (ZeRO-style, sharding the *input* dim of large kernels), and
    tensor parallel (sharding the *output* dim of attention/MLP kernels).
    Collectives are inserted by XLA GSPMD from the NamedSharding
    annotations -- all traffic rides ICI.
  * there is no pipeline, expert, or sequence axis because the model
    family needs none (matching the reference's architecture): no stages,
    no MoE experts, and the token count is bounded by design -- windowed
    attention over a <= 64x64 stride-16 map at the 1024px input cap
    (SURVEY.md section 5 "long-context"), far below where sequence/context
    parallelism pays for its collectives.  The mesh helper accepts
    arbitrary axis names/sizes so pp/ep/sp can be added when a model
    needs them.

Offline sequence-level eval fan-out (SURVEY.md section 2: frames/sequences
are embarrassingly parallel) uses plain dp over the same mesh.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Tuple[str, ...] = ("dp", "fsdp", "tp"),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Build a mesh over the first n devices.

    Default shape puts as much as possible on tp/fsdp for an 8-device slice:
    (dp=2, fsdp=2, tp=2) at n=8; degenerates gracefully for fewer devices.
    """
    devs = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devs)
    if shape is None:
        shape = _default_shape(n, len(axes))
    assert int(np.prod(shape)) == n, (shape, n)
    return Mesh(np.asarray(devs).reshape(shape), axes)


def _default_shape(n: int, n_axes: int) -> Tuple[int, ...]:
    shape = [1] * n_axes
    rem = n
    i = n_axes - 1
    while rem > 1:
        take = 2 if rem % 2 == 0 else rem
        shape[i] = shape[i] * take
        rem //= take
        i = (i - 1) % n_axes
    return tuple(shape)


_REPLICATED_SUFFIXES = (
    "bias",
    "scale",
    "ls1_gamma",
    "ls2_gamma",
    "in_proj_bias",
)


def _spec_for(path: str, shape, mesh: Mesh) -> P:
    """Sharding rule for one parameter.

    Large matmul kernels: (in, out) -> P("fsdp", "tp"); packed torch-style
    (out, in) in_proj weights -> P("tp", "fsdp"); embeddings and small
    vectors replicate.  Any dim not divisible by its mesh axis replicates.
    """

    def fit(spec):
        return P(
            *(
                a if a is not None and shape[i] % mesh.shape[a] == 0 else None
                for i, a in enumerate(spec)
            )
        )

    if any(path.endswith(s) for s in _REPLICATED_SUFFIXES):
        return P()
    if len(shape) == 2 and min(shape) >= 128:
        if path.endswith("in_proj_weight"):  # torch-layout (3D, D)
            return fit(("tp", "fsdp"))
        if "embed" in path or "embedding" in path:
            return P(None, None)
        return fit(("fsdp", "tp"))
    if len(shape) == 4 and shape[-1] >= 128:  # conv HWIO: shard out channels
        return fit((None, None, None, "tp"))
    return P()


def param_shardings(params, mesh: Mesh):
    """NamedShardings for a full parameter tree."""

    def one(path, leaf):
        name = "/".join(str(p.key) if hasattr(p, "key") else str(p) for p in path)
        return NamedSharding(mesh, _spec_for(name, leaf.shape, mesh))

    return jax.tree_util.tree_map_with_path(one, params)


def batch_sharding(mesh: Mesh):
    """Shard the batch dimension over (dp, fsdp)."""
    return NamedSharding(mesh, P(("dp", "fsdp")))


def shard_train_step(train_step, mesh: Mesh, state, batch, targets):
    """jit the train step with explicit in/out shardings and placed inputs.

    Returns (jitted_step, placed_state, placed_batch, placed_targets).
    """
    p_shard = param_shardings(state.params, mesh)
    opt_shard = jax.tree.map(
        lambda _: NamedSharding(mesh, P()),
        state.opt_state,
        is_leaf=lambda x: hasattr(x, "shape"),
    )
    # optimizer moments mirror the parameter shardings where shapes match
    opt_shard = _mirror_opt_shardings(state.opt_state, state.params, p_shard, mesh)

    from boxfusion_tpu.train.step import TrainState

    state_shard = TrainState(params=p_shard, opt_state=opt_shard, step=NamedSharding(mesh, P()))
    b_shard = jax.tree.map(lambda _: batch_sharding(mesh), batch)
    t_shard = jax.tree.map(lambda _: batch_sharding(mesh), targets)

    placed_state = jax.device_put(state, state_shard)
    placed_batch = jax.device_put(batch, b_shard)
    placed_targets = jax.device_put(targets, t_shard)

    jitted = jax.jit(
        train_step,
        in_shardings=(state_shard, b_shard, t_shard),
        out_shardings=(state_shard, NamedSharding(mesh, P())),
    )
    return jitted, placed_state, placed_batch, placed_targets


def shard_inference(apply_fn, mesh: Mesh, params):
    """Model-parallel serving: jit the forward with tp/fsdp-sharded params.

    The batch is replicated (single-stream online serving -- the latency
    path; use the eval runner's per-device sequence fan-out for offline
    throughput instead).  Attention/MLP kernels are sharded by
    `param_shardings` (fsdp on the input dim, tp on the output dim), so
    GSPMD inserts all-gathers/reduce-scatters on ICI around the matmuls;
    activations stay replicated at layer boundaries.

    Returns (jitted_apply, placed_params): call
    ``jitted_apply(placed_params, batch)`` with a host or device batch.
    """
    p_shard = param_shardings(params, mesh)
    placed = jax.device_put(params, p_shard)
    repl = NamedSharding(mesh, P())
    jitted = jax.jit(apply_fn, in_shardings=(p_shard, repl), out_shardings=repl)
    return jitted, placed


def _mirror_opt_shardings(opt_state, params, p_shard, mesh):
    flat_params = {
        jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(p_shard)
    }
    param_shapes = {
        jax.tree_util.keystr(k): v.shape
        for k, v in jax.tree_util.tree_leaves_with_path(params)
    }

    def one(path, leaf):
        key = jax.tree_util.keystr(path)
        # adamw moments nest the param tree under mu/nu; match by suffix
        for pkey, sh in flat_params.items():
            if key.endswith(pkey) and param_shapes[pkey] == leaf.shape:
                return sh
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(one, opt_state)

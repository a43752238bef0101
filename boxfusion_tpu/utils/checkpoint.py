"""Checkpoint / resume: model weights and mid-sequence pipeline state.

Capability target + extension: the reference's persistence story is
``torch.load`` of model weights and a skip-if-pickle-exists sequence resume
(SURVEY.md section 5 "Checkpoint / resume"); all fusion state is in-memory
only.  Here:

  * model params (and full TrainStates) save/restore through orbax;
  * the *entire device-resident pipeline state* (world set + manager +
    observation bank, runtime/device_state.py) snapshots and resumes
    mid-sequence -- something the reference cannot do.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any

import jax
import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_params(path: str, params: Any) -> None:
    """Save a parameter pytree (orbax)."""
    _ckptr().save(os.path.abspath(path), params, force=True)


def restore_params(path: str, template: Any = None) -> Any:
    return _ckptr().restore(os.path.abspath(path), item=template)


def save_pipeline_state(path: str, state) -> None:
    """Snapshot a DeviceState mid-sequence (all arrays + counters)."""
    from boxfusion_tpu.runtime.device_state import DeviceState

    assert isinstance(state, DeviceState)
    tree = {f.name: np.asarray(getattr(state, f.name)) for f in dataclasses.fields(state)}
    _ckptr().save(os.path.abspath(path), tree, force=True)


def restore_pipeline_state(path: str):
    from boxfusion_tpu.runtime.device_state import STATS_WIDTH, DeviceState

    tree = _ckptr().restore(os.path.abspath(path))
    import jax.numpy as jnp

    names = [f.name for f in dataclasses.fields(DeviceState)]
    # stats counters were added (and later widened) after the first release;
    # snapshots with absent/narrower stats restore zero-padded to the current
    # width so the restored state matches init_state's leaf shapes exactly.
    stats = np.asarray(tree.get("stats", np.zeros(0, np.int32)), np.int32)
    if stats.shape[0] < STATS_WIDTH:
        stats = np.pad(stats, (0, STATS_WIDTH - stats.shape[0]))
    tree = dict(tree, stats=stats)
    return DeviceState(**{k: jnp.asarray(tree[k]) for k in names})

"""Checkpoint / resume for long time-marching runs.

A new capability relative to the reference, which only checkpoints in memory
for the dt-retry ladder and relies on per-step VTU files for crash recovery
(reference: NavierStokes.cpp:1213-1217 and the comment at 1321).  Here the
full marching state (u^n, u^{n-1}, t, step, flags) round-trips to disk, so a
crashed or preempted run resumes bit-exactly.

Two backends:
  * plain ``.npz`` (always available, single-host);
  * orbax (if installed) for async, sharding-aware checkpoints of large 3D
    states — selected automatically for sharded arrays.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def save(path: str, state, extra: Optional[dict] = None) -> None:
    """Write the marching state to ``path`` (.npz)."""
    payload = {
        "x_old": np.asarray(state.x_old),
        "x_old_old": np.asarray(state.x_old_old),
        "time": np.asarray(state.time),
        "step": np.asarray(state.step),
        "first_step": np.asarray(state.first_step),
        "second_step": np.asarray(state.second_step),
    }
    if extra:
        for k, v in extra.items():
            payload["extra_" + k] = np.asarray(v)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)  # atomic: a crash never corrupts the previous one


def load(path: str, dtype=None):
    """Read a checkpoint back into a State (import deferred to avoid cycles)."""
    from ..models.solver import State

    with np.load(path) as z:
        cast = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
        state = State(
            x_old=cast(z["x_old"]),
            x_old_old=jnp.array(cast(z["x_old_old"]), copy=True),
            time=cast(z["time"]),
            step=jnp.asarray(z["step"], jnp.int32),
            first_step=jnp.asarray(bool(z["first_step"])),
            second_step=jnp.asarray(bool(z["second_step"])),
        )
        extra = {k[6:]: z[k] for k in z.files if k.startswith("extra_")}
    return state, extra


def save_orbax(path: str, state) -> None:
    """Orbax backend (sharding-aware, for multi-chip 3D states)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.abspath(path),
        {
            "x_old": state.x_old,
            "x_old_old": state.x_old_old,
            "time": state.time,
            "step": state.step,
            "first_step": state.first_step,
            "second_step": state.second_step,
        },
        force=True,
    )
    ckptr.wait_until_finished()


def load_orbax(path: str, abstract_state=None):
    import orbax.checkpoint as ocp

    from ..models.solver import State

    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(os.path.abspath(path))
    return State(
        x_old=tree["x_old"],
        x_old_old=tree["x_old_old"],
        time=tree["time"],
        step=tree["step"],
        first_step=tree["first_step"],
        second_step=tree["second_step"],
    )

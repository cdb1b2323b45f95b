"""Checkpoint / resume for odometry trajectories and the HD map.

The reference has NO persistence: kill the process, lose the map and pose
(SURVEY.md section 5.4 — trajectory is an in-memory ``X_homo``,
simpleMapMaker.cpp:260-261; the map is an in-memory ring).  Here every piece
of run state (accumulated pose, warm-start X, frame index, map ring + trail,
trained bias-net params) serialises through one orbax-compatible
numpy-pytree checkpointer, so long sequences are resumable mid-run.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        items = tree.items()
    elif hasattr(tree, "_asdict"):
        items = tree._asdict().items()
    else:
        return {prefix or "value": np.asarray(tree)}
    for k, v in items:
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, (dict,)) or hasattr(v, "_asdict"):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def save_checkpoint(path: str, state: dict) -> None:
    """Persist a pytree-of-arrays state dict (npz + manifest).

    ``state`` maps names to arrays / dicts / NamedTuples.  Scalars allowed.
    """
    # np.savez appends '.npz' to extension-less paths; normalize up front so
    # the manifest name and load_checkpoint(path) agree with what's on disk.
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(state)
    np.savez_compressed(path, **flat)
    with open(path + ".manifest.json", "w") as f:
        json.dump(
            {k: {"shape": list(v.shape), "dtype": str(v.dtype)} for k, v in flat.items()},
            f,
            indent=1,
        )


def load_checkpoint(path: str) -> dict:
    """Load a flat checkpoint back into a nested dict of numpy arrays."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    out: dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out


# ---------------------------------------------------------------------------
# Pipeline-specific helpers
# ---------------------------------------------------------------------------


def odometry_state(pipe) -> dict:
    """Capture an OdometryPipeline's resumable state."""
    return {
        "T_world": np.asarray(pipe._T_world),
        "X_prev": np.asarray(pipe._X_prev),
        "index": np.asarray(pipe._index),
    }


def restore_odometry(pipe, state: dict) -> None:
    pipe._T_world = jnp.asarray(state["T_world"])
    pipe._X_prev = jnp.asarray(state["X_prev"])
    pipe._index = int(state["index"])
    pipe._model = None  # first scan after resume re-seeds the reference


def map_state(mm) -> dict:
    """Capture a MapMaker's resumable state (ring map + trail + cursor)."""
    s = mm.state
    return {
        "points": np.asarray(s.points),
        "valid": np.asarray(s.valid),
        "write_ptr": np.asarray(s.write_ptr),
        "trail": np.asarray(s.trail),
        "trail_len": np.asarray(s.trail_len),
        "index": np.asarray(mm._index),
    }


def restore_map(mm, state: dict) -> None:
    from icet_tpu.mapping import MapState

    mm.state = MapState(
        points=jnp.asarray(state["points"]),
        valid=jnp.asarray(state["valid"]),
        write_ptr=jnp.asarray(state["write_ptr"]),
        trail=jnp.asarray(state["trail"]),
        trail_len=jnp.asarray(state["trail_len"]),
    )
    mm._index = int(state["index"])
    mm._model = None

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
    # Device-loss recovery mirrors MUST match the restored pose: a dispatch
    # failure before the first successful post-resume frame would otherwise
    # make _recover() re-upload the reset() mirrors (identity pose) and
    # silently snap the trajectory back to the origin.
    pipe._T_host = np.asarray(state["T_world"])
    pipe._X_host = np.asarray(state["X_prev"])
    pipe._last_scan = None  # any pre-restore scan belongs to another run


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


def keyframe_state(ko) -> dict:
    """Capture a KeyframeOdometry's resumable state: the keyframe block
    map, the pose chain, and the PRNG stream (so post-resume block
    downsampling stays decorrelated)."""
    bm = ko.blockmap
    kf_states = (
        np.stack(ko.keyframe_states)
        if ko.keyframe_states else np.zeros((0, 6), np.float32)
    )
    return {
        "bm_points": np.asarray(bm.points),
        "bm_valid": np.asarray(bm.valid),
        "bm_poses": np.asarray(bm.poses),
        "bm_n_blocks": np.asarray(bm.n_blocks),
        "bm_cursor": np.asarray(bm.cursor),
        "T_key": np.asarray(ko._T_key),
        "x_rel": np.asarray(ko._x_rel),
        "delta": np.asarray(ko._delta),
        # _stds_rel and _health0 are NOT persisted: the mandatory
        # resume-spawn resets both before any solve reads them.
        "index": np.asarray(ko._index),
        "key": np.asarray(ko._key),
        "kf_states": kf_states,
        "kf_indices": np.asarray(ko.keyframe_indices, np.int64),
    }


def restore_keyframe(ko, state: dict, replay_overlap: bool = False) -> None:
    """Restore a KeyframeOdometry.  The voxel model is not persisted (it is
    a pure function of the keyframe scan, which the block map only retains
    downsampled) — the first scan after resume spawns a NEW keyframe at the
    restored world pose and odometry continues from there.  Like
    restore_odometry's re-seed, that first scan's own inter-frame motion is
    not registered: resume on the checkpointed frame itself
    (``replay_overlap=True``) to avoid the one-step trajectory gap — that
    flag also skips the resume spawn's map seed insert, since the replayed
    frame's points are already in the restored block map (seeding again
    would double-weight its geometry)."""
    from icet_tpu.keyframe import BlockMap
    from icet_tpu.ops.geometry import pose_matrix

    ko.blockmap = BlockMap(
        points=jnp.asarray(state["bm_points"]),
        valid=jnp.asarray(state["bm_valid"]),
        poses=jnp.asarray(state["bm_poses"]),
        n_blocks=jnp.asarray(state["bm_n_blocks"]),
        cursor=jnp.asarray(state["bm_cursor"]),
    )
    ko._T_key = np.asarray(state["T_key"])
    ko._x_rel = jnp.asarray(state["x_rel"])
    ko._delta = jnp.asarray(state["delta"])
    ko._index = int(state["index"])
    ko._key = jnp.asarray(state["key"])
    ko.keyframe_states = [s for s in np.asarray(state["kf_states"])]
    ko.keyframe_indices = [int(i) for i in np.asarray(state["kf_indices"])]
    ko._model = None
    ko._key_scan = None
    ko._key_samples = None
    ko._resume_seed_insert = not replay_overlap
    # The next scan must spawn at the restored pose, not the origin.
    ko._resume_T = ko._T_key @ np.asarray(
        pose_matrix(jnp.asarray(ko._x_rel))
    )


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

"""Checkpoint / resume for the SLAM state.

The reference has NO persistence at all — its map lives only in RAM and
dies with the process (SURVEY §5.4). Because our world model is a
pytree of fixed-capacity arrays, checkpointing is a flat npz dump of
(TrackState, trajectory) and resume is a reshape-free load. An orbax
path is provided for users who want async/atomic checkpoints in larger
deployments.
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from kbslam.config import SLAMConfig
from kbslam.mapping.state import MapState
from kbslam.pipeline import TrackState, init_state

_FIELDS_TRACK = ["pose_q", "pose_t", "frames_since_kf", "frame_count"]


def save_checkpoint(path: str, state: TrackState,
                    trajectory: Optional[List[np.ndarray]] = None,
                    tsdf=None, atlas=None,
                    kf_insertions: int = 0,
                    meta: Optional[dict] = None) -> None:
    """``tsdf``: optional mapping.dense.TSDFState — persisted so a
    --dense run resumes with its volume instead of silently restarting
    from empty (the sparse map would then cover keyframes the volume
    does not). ``atlas``: optional mapping.submap.SubmapAtlas (the
    --dense-submaps model), with ``kf_insertions`` = the SLAM shell's
    insertion counter so the every-K submap cadence resumes in phase.
    ``meta``: optional flat dict of scalar run metadata (e.g. the
    render_consistency map-quality numbers) stored as meta.* entries
    and read back by load_checkpoint_meta."""
    arrs = {}
    for name, val in state.map._asdict().items():
        arrs[f"map.{name}"] = np.asarray(val)
    for name in _FIELDS_TRACK:
        arrs[f"track.{name}"] = np.asarray(getattr(state, name))
    if trajectory is not None and len(trajectory):
        arrs["trajectory"] = np.stack(trajectory)
    if tsdf is not None:
        arrs["tsdf.tsdf"] = np.asarray(tsdf.tsdf)
        arrs["tsdf.weight"] = np.asarray(tsdf.weight)
    if atlas is not None:
        for name, val in atlas._asdict().items():
            arrs[f"atlas.{name}"] = np.asarray(val)
        arrs["atlas.kf_insertions"] = np.int32(kf_insertions)
    if meta:
        for k, v in meta.items():
            arrs[f"meta.{k}"] = np.float64(v)
    tmp = path + ".tmp.npz"  # savez appends .npz unless present
    np.savez_compressed(tmp, **arrs)
    os.replace(tmp, path)  # atomic publish


def load_checkpoint_meta(path: str) -> dict:
    """Scalar run metadata written via save_checkpoint(meta=...);
    empty dict when the checkpoint carries none."""
    with np.load(path) as z:
        return {k[len("meta."):]: float(z[k]) for k in z.files
                if k.startswith("meta.")}


def load_checkpoint(path: str, cfg: SLAMConfig
                    ) -> Tuple[TrackState, Optional[np.ndarray]]:
    """Returns (state, trajectory or None). Shapes must match cfg."""
    with np.load(path) as z:
        ref = init_state(cfg)
        map_kwargs = {}
        for name, refval in ref.map._asdict().items():
            arr = z[f"map.{name}"]
            if arr.shape != tuple(refval.shape):
                raise ValueError(
                    f"checkpoint field map.{name} has shape {arr.shape}, "
                    f"config expects {tuple(refval.shape)}")
            map_kwargs[name] = jnp.asarray(arr)
        track_kwargs = {n: jnp.asarray(z[f"track.{n}"]) for n in _FIELDS_TRACK}
        traj = z["trajectory"] if "trajectory" in z.files else None
    state = TrackState(map=MapState(**map_kwargs), **track_kwargs)
    return state, traj


def load_checkpoint_tsdf(path: str, cfg: SLAMConfig):
    """Returns the persisted TSDFState, or None if the checkpoint
    predates --dense / was written without it. Shape-checked against
    cfg.dense.dims."""
    from kbslam.mapping.dense import TSDFState

    with np.load(path) as z:
        if "tsdf.tsdf" not in z.files:
            return None
        t, w = z["tsdf.tsdf"], z["tsdf.weight"]
    if t.shape != tuple(cfg.dense.dims):
        raise ValueError(f"checkpoint TSDF dims {t.shape} != config "
                         f"{tuple(cfg.dense.dims)}")
    return TSDFState(tsdf=jnp.asarray(t), weight=jnp.asarray(w))


def load_checkpoint_atlas(path: str, cfg: SLAMConfig):
    """Returns (SubmapAtlas, kf_insertions) from a --dense-submaps
    checkpoint, or (None, 0) if the checkpoint was written without one.
    Shape-checked against cfg.dense (dims AND ring capacity)."""
    from kbslam.mapping.submap import SubmapAtlas

    with np.load(path) as z:
        if "atlas.tsdf" not in z.files:
            return None, 0
        fields = {n: z[f"atlas.{n}"] for n in SubmapAtlas._fields}
        kf_ins = int(z["atlas.kf_insertions"])
    want = (cfg.dense.max_submaps,) + tuple(cfg.dense.dims)
    if fields["tsdf"].shape != want:
        raise ValueError(f"checkpoint atlas shape {fields['tsdf'].shape}"
                         f" != config {want}")
    return SubmapAtlas(**{n: jnp.asarray(v) for n, v in fields.items()
                          }), kf_ins

"""Relocalization after tracking loss — capability extension.

The reference's failure contract is skip-frame-and-hope (SURVEY §5.3:
no relocalization): once the camera leaves the last keyframe's view it
is lost forever, because matching is strictly last-keyframe-only. This
module re-seeds tracking through the loop-closure machinery, in ONE
jitted dispatch per attempt:

  1. extract the frame's features (the tracking frontend's extractor),
  2. place-recognize: the frame's bag-of-binary-words signature is
     scored against every live keyframe's (one [K, W] x [W] matvec —
     kbslam/loop/detect.py),
  3. verify + solve: mutual-best Hamming match against the best
     keyframe, batched PnP-RANSAC on its depth-unprojected points —
     exactly the tracking step's last-KF path with the slot overridden,
  4. on success, insert the frame as a NEW keyframe chained off the
     matched one (pose = T_match ∘ T_cw⁻¹, fusion binds against the
     matched keyframe's rows) so tracking resumes against a fresh
     anchor — the same map mutation a policy insertion performs.

Failure is a masked no-op: the map and pose come back unchanged, so
the host can dispatch attempts without branching on device state.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from kbslam.config import SLAMConfig
from kbslam.geom.camera import Intrinsics, unproject
from kbslam.geom.se3 import SE3
from kbslam.loop.detect import kf_signatures, _word_ids
from kbslam.mapping.state import create_map_points, insert_keyframe
from kbslam.matching.hamming import knn2_ratio_match
from kbslam.pipeline import TrackState, extract_frame
from kbslam.pnp.ransac import ransac_pnp


class RelocResult(NamedTuple):
    success: jnp.ndarray      # bool — relocalized (and keyframe inserted)
    slot: jnp.ndarray         # int32 matched keyframe ring slot
    score: jnp.ndarray        # float32 signature similarity
    num_inliers: jnp.ndarray
    pose_q: jnp.ndarray       # [4] recovered T_wc (unchanged on failure)
    pose_t: jnp.ndarray       # [3]


def reloc_step(state: TrackState, rgb, depth, mask, key,
               intr: Intrinsics, cfg: SLAMConfig, *,
               word_bits: int = 10, score_min: float = 0.5,
               min_inliers: int = 40):
    with jax.default_matmul_precision("highest"):
        return _reloc_impl(state, rgb, depth, mask, key, intr, cfg,
                           word_bits, score_min, min_inliers)


def _reloc_impl(state, rgb, depth, mask, key, intr, cfg,
                word_bits, score_min, min_inliers):
    m = state.map
    feats, depth_kp = extract_frame(rgb, depth, mask, intr, cfg)

    # --- place recognition: frame signature vs the whole ring ------------
    W = 1 << word_bits
    ids = _word_ids(feats.desc, word_bits)
    onehot = (ids[:, None] == jnp.arange(W)).astype(jnp.float32)
    fsig = jnp.sum(onehot * feats.valid[:, None].astype(jnp.float32), 0)
    fsig = fsig / jnp.sqrt(jnp.maximum(jnp.sum(fsig * fsig), 1e-12))
    sigs = kf_signatures(m.kf_desc, m.kf_kp_valid, word_bits)
    scores = jnp.where(m.kf_id >= 0, sigs @ fsig, -1.0)
    slot = jnp.argmax(scores).astype(jnp.int32)
    found = scores[slot] >= score_min

    # --- verify + solve: the tracking step's last-KF path, slot overridden
    q_desc = m.kf_desc[slot]
    q_valid = m.kf_kp_valid[slot] & (m.kf_id[slot] >= 0)
    pts3d = unproject(intr, m.kf_kp_xy[slot], m.kf_kp_depth[slot])
    match = knn2_ratio_match(q_desc, q_valid, feats.desc, feats.valid,
                             cfg.matcher.ratio, cross_check=True)
    pts2d = feats.xy[match.best_idx]
    depth_t = jnp.where(match.is_match, depth_kp[match.best_idx], 0.0)
    pts3d_obs = unproject(intr, pts2d, depth_t)
    pnp = ransac_pnp(key, pts3d, pts2d, match.is_match, intr, cfg.pnp,
                     points3d_obs=pts3d_obs, obs_valid=depth_t > 0)
    success = found & pnp.success & (pnp.num_inliers >= min_inliers)
    # Eviction guard: with a full ring, insert_keyframe below overwrites
    # slot num_kf % capacity. If place recognition matched exactly that
    # (oldest) keyframe, insertion would evict it BEFORE create_map_points
    # fuses against it — the fusion would bind the new frame's keypoint
    # rows to themselves at wrong-correspondence positions. Punt this
    # rare case to the next reloc attempt (scores shift as frames move).
    evict = (m.num_kf >= m.capacity_kf) & (slot == m.num_kf % m.capacity_kf)
    success = success & jnp.logical_not(evict)

    kf_pose = SE3(m.kf_q[slot], m.kf_t[slot])
    new_pose = kf_pose.compose(pnp.T_cw.inverse()).normalize()
    pose_q = jnp.where(success, new_pose.q, state.pose_q)
    pose_t = jnp.where(success, new_pose.t, state.pose_t)

    # --- re-anchor: insert the frame as a keyframe on success ------------
    new_map = insert_keyframe(m, feats, depth_kp,
                              SE3(pose_q, pose_t), do=success)
    fuse_slot = jnp.where(success, slot, m.capacity_kf)
    new_map = create_map_points(new_map, match, intr.fx, intr.fy,
                                intr.cx, intr.cy, do=success,
                                prev_slot=fuse_slot)

    new_state = TrackState(
        map=new_map,
        pose_q=pose_q,
        pose_t=pose_t,
        frames_since_kf=jnp.where(success, 0, state.frames_since_kf),
        frame_count=state.frame_count,  # the track step already counted
    )
    return new_state, RelocResult(
        success=success, slot=slot, score=scores[slot],
        num_inliers=pnp.num_inliers, pose_q=pose_q, pose_t=pose_t)


@functools.lru_cache(maxsize=8)
def make_reloc_step(cfg: SLAMConfig, intr: Intrinsics,
                    use_mask: bool = True, *, word_bits: int = 10,
                    score_min: float = 0.5, min_inliers: int = 40,
                    seed: int = 0):
    """lru_cached jit; the PRNG key folds the frame count in-graph like
    make_track_step(auto_key=True)."""
    base = jax.random.PRNGKey(seed)

    if use_mask:
        def f(state, rgb, depth, mask):
            key = jax.random.fold_in(base, state.frame_count + (1 << 20))
            return reloc_step(state, rgb, depth, mask, key, intr, cfg,
                              word_bits=word_bits, score_min=score_min,
                              min_inliers=min_inliers)
    else:
        def f(state, rgb, depth):
            key = jax.random.fold_in(base, state.frame_count + (1 << 20))
            return reloc_step(state, rgb, depth, None, key, intr, cfg,
                              word_bits=word_bits, score_min=score_min,
                              min_inliers=min_inliers)

    return jax.jit(f, donate_argnums=(0,))

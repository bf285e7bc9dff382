"""Keyframe insertion policy (reference: VisualOdometry.cpp:99-126).

Insert a keyframe iff at least ``min_frame_gap`` frames passed since the
last insertion AND (relative translation > 0.5 m OR relative rotation >
5 deg OR PnP inlier ratio < 0.4). Pure predicate on traced values — the
reference's function-static frame counter becomes explicit state
threaded through the tracking step.
"""
from __future__ import annotations

import jax.numpy as jnp

from kbslam.config import KeyframePolicyConfig
from kbslam.geom.se3 import SE3


def should_add_keyframe(
    pose: SE3,
    last_kf_pose: SE3,
    frames_since_kf: jnp.ndarray,
    inlier_ratio: jnp.ndarray,
    cfg: KeyframePolicyConfig,
) -> jnp.ndarray:
    rel = last_kf_pose.inverse().compose(pose)
    translation = rel.translation_norm()
    angle_deg = rel.rotation_angle() * (180.0 / jnp.pi)
    trigger = (
        (translation > cfg.translation_threshold)
        | (angle_deg > cfg.rotation_threshold_deg)
        | (inlier_ratio < cfg.min_inlier_ratio)
    )
    return (frames_since_kf >= cfg.min_frame_gap) & trigger

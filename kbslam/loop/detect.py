"""Loop-closure detection + geometric verification.

The reference has no place recognition (drift is unbounded). TPU-first
design, reusing the tracking machinery:

  - Place signatures are bag-of-binary-words histograms computed
    DENSELY from the keyframe descriptor ring: each rBRIEF descriptor
    maps to one of ``n_words`` vocabulary words by reading ``word_bits``
    fixed descriptor bit positions as an integer (a random-projection
    vocabulary — no training, deterministic); the per-keyframe word
    histogram is an incidence one-hot matmul, and candidate scoring is
    ONE [K, W] x [W] matvec over the whole ring. No tree/inverted-file
    walk — the MXU eats the whole database per query.
  - Geometric verification is exactly the tracking frontend's last-KF
    path: Hamming kNN ratio match (matching/hamming.py) between the
    candidate and query keyframes, then batched PnP-RANSAC (pnp/ransac)
    on the candidate's depth-unprojected 3D points — accepted loops
    yield the metric relative pose T_cq = T_c^-1 T_q for the pose graph.

Everything below is pure and jittable at fixed shapes.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from kbslam.config import SLAMConfig
from kbslam.geom.camera import Intrinsics, unproject
from kbslam.matching.hamming import knn2_ratio_match
from kbslam.pnp.ransac import ransac_pnp


class LoopCandidate(NamedTuple):
    found: jnp.ndarray      # bool — a candidate passed the score gate
    slot: jnp.ndarray       # int32 ring slot of the candidate keyframe
    score: jnp.ndarray      # float32 signature similarity
    scores: jnp.ndarray     # [K] all (masked) scores, for diagnostics


class LoopConstraint(NamedTuple):
    ok: jnp.ndarray         # bool — geometric verification passed
    num_inliers: jnp.ndarray
    rel_q: jnp.ndarray      # [4] measured T_cq = T_c^-1 T_q
    rel_t: jnp.ndarray      # [3]


def _word_ids(desc_bits: jnp.ndarray, word_bits: int) -> jnp.ndarray:
    """[..., 256] uint8 bits -> [...] int32 word ids in [0, 2^word_bits).

    Bit positions are spread across the descriptor (stride 256//bits)
    so the word reflects globally-distributed comparisons rather than
    one sampling-pattern neighborhood. Implemented as ONE [.., 256]x[256]
    matvec with a power-of-two selector vector: the obvious strided
    gather desc[..., pos] costs ~45 ns/element serially on TPU
    (CLAUDE.md gotcha #7 — ~88 ms over a full 64x3072 ring), the matvec
    is MXU noise."""
    stride = 256 // word_bits
    pos = np.arange(word_bits) * stride
    w = np.zeros(256, np.float32)
    w[pos] = (2.0 ** np.arange(word_bits)).astype(np.float32)
    ids = desc_bits.astype(jnp.float32) @ jnp.asarray(w)
    return ids.astype(jnp.int32)


def kf_signatures(kf_desc: jnp.ndarray, kf_valid: jnp.ndarray,
                  word_bits: int = 10) -> jnp.ndarray:
    """[K, F, 256] bits + [K, F] valid -> [K, W] L2-normalized word
    histograms (one-hot incidence matmul, no scatter)."""
    W = 1 << word_bits
    ids = _word_ids(kf_desc, word_bits)                     # [K, F]

    def one_kf(args):
        kid, kv = args                                      # [F], [F]
        onehot = (kid[:, None] == jnp.arange(W)).astype(jnp.float32)
        return jnp.sum(onehot * kv[:, None].astype(jnp.float32), axis=0)

    # sequential map: the full one-hot would be [K, F, W] (~800 MB at
    # ring capacity); per-keyframe it is [F, W] (~12 MB)
    hist = jax.lax.map(one_kf, (ids, kf_valid))             # [K, W]
    norm = jnp.sqrt(jnp.maximum(jnp.sum(hist * hist, -1, keepdims=True),
                                1e-12))
    return hist / norm


def detect_loop(m, query_slot: jnp.ndarray, *, word_bits: int = 10,
                min_separation: int = 10,
                score_min: float = 0.80) -> LoopCandidate:
    """Score the query keyframe's signature against every live ring
    slot; mask out empty slots, stale queries, and keyframes within
    ``min_separation`` insertions of the query (recent neighbors always
    look similar — that is tracking, not a loop)."""
    sigs = kf_signatures(m.kf_desc, m.kf_kp_valid, word_bits)   # [K, W]
    scores = sigs @ sigs[query_slot]                            # [K]
    qid = m.kf_id[query_slot]
    sep_ok = jnp.abs(m.kf_id - qid) >= min_separation
    valid = (m.kf_id >= 0) & sep_ok
    scores = jnp.where(valid, scores, -1.0)
    best = jnp.argmax(scores)
    return LoopCandidate(found=scores[best] >= score_min,
                         slot=best.astype(jnp.int32),
                         score=scores[best], scores=scores)


def verify_loop(m, cand_slot: jnp.ndarray, query_slot: jnp.ndarray,
                key: jnp.ndarray, intr: Intrinsics,
                cfg: SLAMConfig, min_inliers: int = 40,
                max_trans_disc: float = 0.30,
                max_rot_disc_deg: float = 10.0) -> LoopConstraint:
    """Geometric verification = the tracking frontend's exact last-KF
    path between two keyframes: candidate (3D from its depth) vs query
    (2D keypoints). PnP success + inlier count gate the loop; the
    accepted constraint is T_cq (query pose in the candidate frame) —
    pipeline.py:224-229 uses the same T_cw^-1 chaining.

    Two anti-aliasing gates beyond plain inlier counting (measured
    necessary: a spheres scene with repeated texture produced 87
    CONSISTENT wrong matches and a verified pose 551 mm off while the
    drifted map relative pose was within 28 mm):
      - matching is mutual-best (cross_check) regardless of the
        tracking matcher config — wide-baseline loop pairs alias far
        more than consecutive frames;
      - drift-envelope consistency: the measured relative pose must lie
        within (max_trans_disc, max_rot_disc_deg) of the CURRENT map's
        relative pose. Loop closure corrects accumulated drift, which
        is bounded; a constraint outside the plausible drift envelope
        is perceptual aliasing, not a loop."""
    from kbslam.geom.se3 import SE3

    q_desc = m.kf_desc[cand_slot]
    q_valid = m.kf_kp_valid[cand_slot]
    pts3d = unproject(intr, m.kf_kp_xy[cand_slot], m.kf_kp_depth[cand_slot])

    t_desc = m.kf_desc[query_slot]
    t_valid = m.kf_kp_valid[query_slot]
    t_xy = m.kf_kp_xy[query_slot]
    t_z = m.kf_kp_depth[query_slot]

    match = knn2_ratio_match(q_desc, q_valid, t_desc, t_valid,
                             cfg.matcher.ratio, cross_check=True)
    pts2d = t_xy[match.best_idx]
    depth_t = jnp.where(match.is_match, t_z[match.best_idx], 0.0)
    pts3d_obs = unproject(intr, pts2d, depth_t)

    pnp = ransac_pnp(key, pts3d, pts2d, match.is_match, intr, cfg.pnp,
                     points3d_obs=pts3d_obs, obs_valid=depth_t > 0)
    ok = pnp.success & (pnp.num_inliers >= min_inliers)
    rel = pnp.T_cw.inverse().normalize()   # T_cq (see pipeline chaining)

    T_c = SE3(m.kf_q[cand_slot], m.kf_t[cand_slot])
    T_q = SE3(m.kf_q[query_slot], m.kf_t[query_slot])
    rel_map = T_c.inverse().compose(T_q)
    disc = rel_map.inverse().compose(rel)
    ok = ok & (disc.translation_norm() <= max_trans_disc) \
        & (disc.rotation_angle() * (180.0 / jnp.pi) <= max_rot_disc_deg)
    return LoopConstraint(ok=ok, num_inliers=pnp.num_inliers,
                          rel_q=rel.q, rel_t=rel.t)


@functools.lru_cache(maxsize=8)
def make_loop_probe(cfg: SLAMConfig, intr: Intrinsics, *,
                    word_bits: int = 10, min_separation: int = 10,
                    score_min: float = 0.80, min_inliers: int = 40,
                    max_trans_disc: float = 0.30,
                    max_rot_disc_deg: float = 10.0):
    """ONE jitted dispatch: detect + (always-executed, masked) verify.
    Returns (LoopCandidate, LoopConstraint); constraint.ok already folds
    in candidate.found.

    ``query_id`` is the keyframe id the caller EXPECTS in ``query_slot``
    (its insertion ordinal − 1): the probe no-ops when the slot no
    longer holds it (evicted by a ring wrap, or culled) — host runners
    queue probes and may drain them late (loop/runner.py), so the gate
    makes stale probes self-invalidating without a host-side read."""

    def probe(m, query_slot, query_id, key):
        # bf16-default TPU matmul precision corrupts the verification
        # geometry (DLT / GN normal matrices) — same rationale as
        # pipeline.track_step / ba.local_ba (CLAUDE.md gotcha #4).
        with jax.default_matmul_precision("highest"):
            cand = detect_loop(m, query_slot, word_bits=word_bits,
                               min_separation=min_separation,
                               score_min=score_min)
            fresh = m.kf_id[query_slot] == query_id
            cand = cand._replace(found=cand.found & fresh)
            cons = verify_loop(m, cand.slot, query_slot, key, intr, cfg,
                               min_inliers=min_inliers,
                               max_trans_disc=max_trans_disc,
                               max_rot_disc_deg=max_rot_disc_deg)
            return cand, cons._replace(ok=cons.ok & cand.found)

    return jax.jit(probe)

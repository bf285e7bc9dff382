"""Loop closure end-to-end: build the pose graph from a MapState,
solve it, and write corrected keyframe poses + landmarks back.

Node indexing is by AGE RANK, not ring slot: node r holds the keyframe
with id = id_min + r (its ring slot is (id_min + r) % capacity — the
monotone-id ring makes this pure arithmetic, no sorting). Rank 0 (the
oldest live keyframe) is the gauge the solver holds fixed. Odometry
edges connect consecutive ranks with relative poses taken from the
CURRENT map (they embed every BA refinement so far); the verified loop
constraint is the final edge.

Landmarks are corrected rigidly by their oldest live observer's pose
change: X' = T_new(ref) T_old(ref)^-1 X — the standard post-loop map
update (each landmark was triangulated from its reference keyframe's
depth, so it rides that keyframe's correction).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from kbslam.geom.se3 import SE3
from kbslam.loop.pose_graph import PoseGraph, PoseGraphStats, solve_pose_graph


def build_pose_graph(m, loop_slot_i, loop_slot_j, loop_rel_q, loop_rel_t,
                     loop_w: float = 1.0,
                     loop_ok=None) -> Tuple[PoseGraph, jnp.ndarray]:
    """PoseGraph over the live keyframes of a MapState + one loop edge
    between ring slots (i, j) with measured T_ij. Returns (graph,
    id_min) — id_min maps node ranks back to ring slots. loop_ok=False
    zeroes the loop edge (the graph is then odometry-only and the solve
    is a no-op, enabling a branchless host call)."""
    K = m.capacity_kf
    n_live = jnp.minimum(m.num_kf, K)
    id_min = m.num_kf - n_live                     # oldest live id

    ranks = jnp.arange(K)
    ids = id_min + ranks
    slots = ids % K
    node_valid = ranks < n_live
    node_q = jnp.where(node_valid[:, None], m.kf_q[slots],
                       jnp.array([1.0, 0, 0, 0]))
    node_t = jnp.where(node_valid[:, None], m.kf_t[slots], 0.0)

    # odometry edges (r, r+1) from current map poses
    e_i = ranks
    e_j = jnp.minimum(ranks + 1, K - 1)
    odo_valid = (ranks + 1) < n_live
    Ti = SE3(node_q[e_i], node_t[e_i])
    Tj = SE3(node_q[e_j], node_t[e_j])
    rel = Ti.inverse().compose(Tj).normalize()

    # loop edge appended in the last slot: slots -> ranks
    def rank_of(slot):
        # id of the keyframe in `slot` (live by construction of callers)
        return m.kf_id[slot] - id_min

    li, lj = rank_of(loop_slot_i), rank_of(loop_slot_j)
    ok = jnp.bool_(True) if loop_ok is None else loop_ok
    ok = ok & (li >= 0) & (lj >= 0)
    edge_i = jnp.concatenate([e_i, li[None].astype(jnp.int32)])
    edge_j = jnp.concatenate([e_j, lj[None].astype(jnp.int32)])
    rel_q = jnp.concatenate([rel.q, loop_rel_q[None]])
    rel_t = jnp.concatenate([rel.t, loop_rel_t[None]])
    edge_w = jnp.concatenate([odo_valid.astype(jnp.float32),
                              jnp.where(ok, loop_w, 0.0)[None]])
    g = PoseGraph(node_q=node_q, node_t=node_t, node_valid=node_valid,
                  edge_i=jnp.where(edge_w > 0, edge_i, 0),
                  edge_j=jnp.where(edge_w > 0, edge_j, 0),
                  rel_q=rel_q, rel_t=rel_t, edge_w=edge_w)
    return g, id_min


def _landmark_ref_rank(m, id_min) -> jnp.ndarray:
    """[P] age rank of each landmark slot's OLDEST live observer
    (capacity_kf where unobserved)."""
    K, P = m.capacity_kf, m.capacity_mp

    def body(r, ref):
        slot = (id_min + r) % K
        row = m.kf_mp[slot]                          # [F] landmark ids
        live = m.mp_ref_live(row) & (r < jnp.minimum(m.num_kf, K))
        pslots = jnp.where(live, row % P, P)
        return ref.at[pslots].min(r, mode="drop")

    return jax.lax.fori_loop(0, K, body, jnp.full((P,), K, jnp.int32))


def apply_pose_graph_correction(m, g: PoseGraph, id_min):
    """Write solved node poses back to the ring and rigidly carry each
    landmark with its reference keyframe's correction."""
    K = m.capacity_kf
    ranks = jnp.arange(K)
    slots = (id_min + ranks) % K
    row_idx = jnp.where(g.node_valid, slots, K)

    # per-rank correction D_r = T_new T_old^-1 (identity on dead ranks)
    T_old = SE3(m.kf_q[slots], m.kf_t[slots])
    T_new = SE3(g.node_q, g.node_t)
    D = T_new.compose(T_old.inverse()).normalize()
    Dq = jnp.where(g.node_valid[:, None], D.q, jnp.array([1.0, 0, 0, 0]))
    Dt = jnp.where(g.node_valid[:, None], D.t, 0.0)

    kf_q = m.kf_q.at[row_idx].set(g.node_q, mode="drop")
    kf_t = m.kf_t.at[row_idx].set(g.node_t, mode="drop")

    rank = _landmark_ref_rank(m, id_min)  # once: XLA does not CSE loops
    ref = jnp.clip(rank, 0, K - 1)
    observed = rank < K
    Dl = SE3(Dq[ref], Dt[ref])
    mp_pos = jnp.where(observed[:, None], Dl.apply(m.mp_pos), m.mp_pos)
    return m._replace(kf_q=kf_q, kf_t=kf_t, mp_pos=mp_pos)


def close_loop(m, loop_slot_i, loop_slot_j, loop_rel_q, loop_rel_t,
               loop_ok=None, loop_w: float = 1.0,
               max_iterations: int = 50):
    """Build + solve + write back, as one pure function (jittable).
    With loop_ok=False the loop edge has zero weight, the odometry-only
    graph is already at its optimum, and the map comes back unchanged
    (up to float noise) — callers can dispatch unconditionally."""
    # bf16-default TPU matmul precision corrupts the GN normal
    # equations J^T J (CLAUDE.md gotcha #4) — same wrap as ba.local_ba.
    with jax.default_matmul_precision("highest"):
        g, id_min = build_pose_graph(m, loop_slot_i, loop_slot_j,
                                     loop_rel_q, loop_rel_t,
                                     loop_w=loop_w, loop_ok=loop_ok)
        g2, stats = solve_pose_graph(g, max_iterations=max_iterations)
        return apply_pose_graph_correction(m, g2, id_min), stats


@functools.lru_cache(maxsize=8)
def make_close_loop(max_iterations: int = 50, loop_w: float = 1.0):
    """lru_cached jit of close_loop (no donation: callers may keep the
    pre-correction map for diagnostics). ``loop_w`` is
    LoopConfig.loop_weight — the pose-graph weight of the loop edge
    relative to the unit-weight odometry chain."""
    return jax.jit(
        lambda m, si, sj, rq, rt, ok: close_loop(
            m, si, sj, rq, rt, loop_ok=ok, loop_w=loop_w,
            max_iterations=max_iterations))

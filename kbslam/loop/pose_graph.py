"""SE(3) pose-graph optimization — the loop-closure backend.

The reference has no loop closure at all (drift is unbounded; SURVEY
§5.3: "no relocalization"). This is a deliberate capability extension,
built the TPU way: the graph is a fixed-capacity padded problem (N node
slots, E edge slots, masked), the residual is the standard relative-SE3
error r_e = log(T_meas_ij^-1 · T_i^-1 · T_j) with a left-multiplicative
retraction, Jacobians come from jacfwd at delta=0 (the state dim is
6N <= 384 for the 64-keyframe ring — a dense solve is one small MXU
matmul, not a sparse-solver problem), and the damped LM loop reuses the
local-BA accept/reject schedule with a function-tolerance early stop.

Gauge: node 0 (the oldest live keyframe) is held fixed.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from kbslam.geom.se3 import SE3


class PoseGraph(NamedTuple):
    """Padded pose graph. Invalid nodes/edges carry weight/valid 0."""

    node_q: jnp.ndarray    # [N, 4] T_wc rotation (w, x, y, z)
    node_t: jnp.ndarray    # [N, 3]
    node_valid: jnp.ndarray  # [N] bool
    edge_i: jnp.ndarray    # [E] int32 source node index
    edge_j: jnp.ndarray    # [E] int32 target node index
    rel_q: jnp.ndarray     # [E, 4] measured T_ij = T_i^-1 T_j
    rel_t: jnp.ndarray     # [E, 3]
    edge_w: jnp.ndarray    # [E] float32 weight (0 = padding edge)


class PoseGraphStats(NamedTuple):
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    iterations: jnp.ndarray
    accepted: jnp.ndarray


def _edge_residuals(node_q, node_t, g: PoseGraph) -> jnp.ndarray:
    """[E, 6] whitened residuals log(T_meas^-1 T_i^-1 T_j)."""
    Ti = SE3(node_q[g.edge_i], node_t[g.edge_i])
    Tj = SE3(node_q[g.edge_j], node_t[g.edge_j])
    T_meas = SE3(g.rel_q, g.rel_t)
    err = T_meas.inverse().compose(Ti.inverse().compose(Tj))
    return err.log() * jnp.sqrt(g.edge_w)[:, None]


def _retract(node_q, node_t, delta, free):
    """Left-multiplicative update T_i <- exp(delta_i) T_i on free nodes."""
    dT = SE3.exp(delta)
    T = dT.compose(SE3(node_q, node_t)).normalize()
    q = jnp.where(free[:, None], T.q, node_q)
    t = jnp.where(free[:, None], T.t, node_t)
    return q, t


def solve_pose_graph(
    g: PoseGraph,
    max_iterations: int = 50,
    init_lambda: float = 1e-6,
    fn_tol: float = 1e-9,
) -> Tuple[PoseGraph, PoseGraphStats]:
    """Damped Gauss-Newton (LM accept/reject) on the padded graph.
    Returns the graph with optimized node poses. Pure function — safe to
    jit (see make_pose_graph_solver)."""
    N = g.node_q.shape[0]
    free = g.node_valid & (jnp.arange(N) != 0)  # node 0 = gauge
    freef = jnp.repeat(free.astype(jnp.float32), 6)

    def cost_fn(q, t):
        r = _edge_residuals(q, t, g)
        return jnp.sum(r * r)

    def linearize(q, t):
        def r_of_delta(delta):
            q2, t2 = _retract(q, t, delta.reshape(N, 6), free)
            return _edge_residuals(q2, t2, g).reshape(-1)

        J = jax.jacfwd(r_of_delta)(jnp.zeros(6 * N))   # [6E, 6N]
        r = _edge_residuals(q, t, g).reshape(-1)
        H = J.T @ J
        b = -(J.T @ r)
        return H, b, jnp.sum(r * r)

    def lm_step(carry):
        q, t, lam, cost, H, b, it, acc, done, trips = carry
        # damp + gauge/padding mask (unit diagonal on fixed dofs)
        Hd = H + lam * jnp.diag(jnp.clip(jnp.diagonal(H), 1e-8, 1e32))
        Hd = Hd * freef[:, None] * freef[None, :] + jnp.diag(1.0 - freef)
        delta = jnp.linalg.solve(Hd, b * freef)
        q2, t2 = _retract(q, t, (delta * freef).reshape(N, 6), free)
        new_cost = cost_fn(q2, t2)
        finite = jnp.isfinite(new_cost) & jnp.all(jnp.isfinite(delta))
        accept = finite & (new_cost < cost) & jnp.logical_not(done)

        q = jnp.where(accept, q2, q)
        t = jnp.where(accept, t2, t)
        cost_out = jnp.where(accept, new_cost, cost)
        H, b, _ = jax.lax.cond(
            accept, lambda: linearize(q2, t2), lambda: (H, b, cost))
        lam = jnp.where(done, lam,
                        jnp.clip(jnp.where(accept, lam / 3.0, lam * 4.0),
                                 1e-10, 1e10))
        rel = jnp.abs(cost - cost_out) / jnp.maximum(cost, 1e-18)
        done = done | (accept & (rel < fn_tol)) | (lam >= 1e10)
        it = jnp.where(done, it, it + 1)
        acc = acc + accept.astype(jnp.int32)
        return q, t, lam, cost_out, H, b, it, acc, done, trips + 1

    def lm_cond(carry):
        done, trips = carry[-2], carry[-1]
        return jnp.logical_not(done) & (trips < max_iterations)

    H0, b0, cost0 = linearize(g.node_q, g.node_t)
    init = (g.node_q, g.node_t, jnp.float32(init_lambda), cost0, H0, b0,
            jnp.int32(0), jnp.int32(0), jnp.bool_(False), jnp.int32(0))
    q, t, _, cost, _, _, it, acc, _, _ = jax.lax.while_loop(
        lm_cond, lm_step, init)
    stats = PoseGraphStats(initial_cost=cost0, final_cost=cost,
                           iterations=it, accepted=acc)
    return g._replace(node_q=q, node_t=t), stats


@functools.lru_cache(maxsize=8)
def make_pose_graph_solver(max_iterations: int = 50,
                           init_lambda: float = 1e-6):
    """lru_cached jit (same rationale as ba.local_ba.make_local_ba)."""

    def solve(g):
        # J^T J needs real f32 on TPU (CLAUDE.md gotcha #4)
        with jax.default_matmul_precision("highest"):
            return solve_pose_graph(g, max_iterations, init_lambda)

    return jax.jit(solve)

"""Multi-stream tracking: the data-parallel axis of this workload.

The reference is strictly single-stream (one camera, one map). On TPU,
the natural scale-out is N independent RGB-D streams tracked by one
jitted program: the per-stream state is batched (leading stream axis on
every MapState/TrackState leaf), the step is vmapped, and the batch is
sharded over a `jax.sharding.Mesh` so each chip owns a contiguous block
of streams (BASELINE.json config 4; SURVEY §2.4 "data parallelism
analogue"). No collectives are required in steady state — placement is
the point — but everything compiles through pjit so meshes of any shape
work.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kbslam.config import SLAMConfig
from kbslam.geom.camera import Intrinsics
from kbslam.pipeline import TrackState, init_state, track_step


def batched_init_state(cfg: SLAMConfig, num_streams: int) -> TrackState:
    s = init_state(cfg)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (num_streams,) + x.shape).copy(), s
    )


def make_multistream_step(
    cfg: SLAMConfig,
    intr: Intrinsics,
    mesh: Optional[Mesh] = None,
    axis: str = "stream",
    use_mask: bool = False,
    donate: bool = True,
):
    """Returns a jitted step: (state[S], rgb[S,H,W,3], depth[S,H,W], key[S])
    -> (state[S], out[S]), sharded over ``axis`` when a mesh is given.

    Uses the branchless keyframe insertion (SLAMConfig.branchless_insert):
    under vmap, the single-stream lax.cond insertion executes both
    branches AND select-copies the full map state every frame — measured
    ~0.85 ms/stream (benchmarks/exp_multistream2.py); the masked-scatter
    form pays only the ~0.4 ms insertion compute."""
    cfg = cfg.replace(branchless_insert=True)

    def base(state, rgb, depth, key):
        return track_step(state, rgb, depth, None, key, intr, cfg)

    vstep = jax.vmap(base)
    if mesh is None:
        return jax.jit(vstep, donate_argnums=(0,) if donate else ())

    shard = NamedSharding(mesh, P(axis))
    return jax.jit(
        vstep,
        in_shardings=(shard, shard, shard, shard),
        out_shardings=(shard, shard),
        donate_argnums=(0,) if donate else (),
    )


def shard_streams(tree, mesh: Mesh, axis: str = "stream"):
    """Place a stream-batched pytree onto the mesh (block-sharded axis 0)."""
    return jax.device_put(tree, NamedSharding(mesh, P(axis)))


def make_multistream_scan(
    cfg: SLAMConfig,
    intr: Intrinsics,
    apply_every: int = 4,
    seed: int = 0,
    donate: bool = True,
):
    """Deferred-insertion multistream scan: jit of
    (state[S], rgb[T,S,H,W,3], depth[T,S,H,W]) -> (state[S], ninl[T,S]).

    The per-frame insertion tail (insert_keyframe + create_map_points as
    masked scatters) costs ~0.37 ms/stream/frame under vmap even on
    non-insertion frames (benchmarks/exp_multistream2.py). Here the
    vmapped step only CAPTURES the insertion payload (PendingInsert) and
    the scan is nested: an outer scan over blocks of ``apply_every``
    frames runs the inner per-frame scan, then applies every stream's
    pending insertion ONCE — structurally 1/K of the insertion compute,
    with no lax.cond (batched cond executes both branches; scalar cond
    copy-selects the carry).

    Semantics: a keyframe lands in the map up to K-1 frames after its
    flag frame (the same chunk-late contract as streaming.py's BA);
    frames in between keep matching the previous keyframe. Requires
    apply_every <= policy.min_frame_gap so at most one pending exists
    per stream per block. T must be divisible by apply_every.
    """
    assert apply_every <= cfg.policy.min_frame_gap, (
        "apply_every must not exceed min_frame_gap: a second flag could "
        "overwrite an unapplied pending")
    from kbslam.pipeline import apply_pending, empty_pending, track_step

    S_axis = 0  # streams on the leading axis

    def one(st, rgb, dep, key):
        return track_step(st, rgb, dep, None, key, intr, cfg,
                          defer_insert=True)

    vstep = jax.vmap(one)
    vapply = jax.vmap(lambda m, p: apply_pending(m, p, intr, cfg))

    def run(state, rgb, dep):
        T, S = rgb.shape[0], rgb.shape[1]
        assert T % apply_every == 0, (T, apply_every)
        rgb_b = rgb.reshape((T // apply_every, apply_every) + rgb.shape[1:])
        dep_b = dep.reshape((T // apply_every, apply_every) + dep.shape[1:])
        pend0 = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (S,) + x.shape).copy(),
            empty_pending(cfg))

        def inner(carry, xs):
            st, pend = carry
            r, d = xs
            keys = jax.vmap(
                lambda i: jax.random.fold_in(jax.random.PRNGKey(seed),
                                             st.frame_count[0] * S + i)
            )(jnp.arange(S))
            st2, out, newp = vstep(st, r, d, keys)
            # a fresh flag overwrites the (necessarily applied) slot
            pend = jax.tree.map(
                lambda n, o: jnp.where(
                    newp.do.reshape((S,) + (1,) * (n.ndim - 1)), n, o),
                newp, pend)
            return (st2, pend), out.num_inliers

        def outer(carry, xs):
            st, pend = carry
            (st, pend), ninl = jax.lax.scan(inner, (st, pend), xs)
            st = st._replace(map=vapply(st.map, pend))
            pend = pend._replace(do=jnp.zeros_like(pend.do))
            return (st, pend), ninl

        (state, _), ninl = jax.lax.scan(outer, (state, pend0),
                                        (rgb_b, dep_b))
        return state, ninl.reshape(T, S)

    return jax.jit(run, donate_argnums=(0,) if donate else ())

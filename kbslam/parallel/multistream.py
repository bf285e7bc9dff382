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

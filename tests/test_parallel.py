"""Multi-stream data-parallel tracking on the 8-virtual-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kbslam.config import tiny_config
from kbslam.geom.camera import Intrinsics
from kbslam.io.synthetic import render_sequence
from kbslam.parallel.multistream import (
    batched_init_state, make_multistream_step, shard_streams,
)


def test_multistream_tracks_independent_streams():
    S = 8
    cfg = tiny_config(height=120, width=160)
    cfg = cfg.replace(image_height=120, image_width=160)
    # different seed per stream -> genuinely independent scenes
    seqs = [render_sequence(num_frames=4, height=120, width=160, fx=130.0,
                            seed=s) for s in range(S)]
    intr = Intrinsics.create(130.0, 130.0, (160 - 1) / 2, (120 - 1) / 2)

    mesh = Mesh(np.array(jax.devices()[:S]), axis_names=("stream",))
    step = make_multistream_step(cfg, intr, mesh=mesh, donate=False)
    states = shard_streams(batched_init_state(cfg, S), mesh)
    shard = NamedSharding(mesh, P("stream"))

    outs = []
    for t in range(4):
        rgb = jax.device_put(
            jnp.asarray(np.stack([s.rgb[t] for s in seqs])), shard)
        dep = jax.device_put(
            jnp.asarray(np.stack([s.depth[t] for s in seqs])), shard)
        keys = jax.device_put(
            jnp.stack([jax.random.fold_in(jax.random.PRNGKey(s), t)
                       for s in range(S)]), shard)
        states, out = step(states, rgb, dep, keys)
        outs.append(jax.device_get(out))

    # every stream inserted its first keyframe and keeps its own map
    assert np.asarray(states.map.num_kf).shape == (S,)
    assert (np.asarray(states.map.num_kf) >= 1).all()
    assert outs[0].added_kf.all()
    # streams differ (independent scenes -> different match counts)
    assert len(set(int(x) for x in outs[-1].num_matches)) > 1

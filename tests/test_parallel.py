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


def test_branchless_insert_matches_cond_path():
    """SLAMConfig.branchless_insert (the vmap-friendly masked-scatter
    insertion the multistream step uses) is bit-equivalent to the
    single-stream lax.cond path over a real tracked sequence including
    keyframe insertions and fusion."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from kbslam.config import SLAMConfig, OrbConfig, PnPConfig, MapConfig
    from kbslam.geom.camera import Intrinsics
    from kbslam.io.synthetic import render_sequence
    from kbslam.pipeline import init_state, make_track_step

    cfg = SLAMConfig(
        image_height=120, image_width=160,
        orb=OrbConfig(num_features=256, num_levels=3, max_features=256),
        pnp=PnPConfig(num_hypotheses=64),
        map=MapConfig(max_keyframes=8, max_map_points=4096),
    )
    seq = render_sequence(num_frames=20, height=120, width=160)
    intr = Intrinsics.from_matrix(seq.K)

    outs = {}
    states = {}
    for branchless in (False, True):
        c = cfg.replace(branchless_insert=branchless)
        step = make_track_step(c, intr, use_mask=False, auto_key=True)
        st = init_state(c)
        got = []
        for i in range(20):
            st, out = step(st, jnp.asarray(seq.rgb[i]),
                           jnp.asarray(seq.depth[i]))
            got.append(jax.device_get(out))
        outs[branchless] = got
        states[branchless] = jax.device_get(st)

    for a, b in zip(outs[False], outs[True]):
        assert bool(a.added_kf) == bool(b.added_kf)
        np.testing.assert_array_equal(np.asarray(a.pose_t),
                                      np.asarray(b.pose_t))
    for la, lb in zip(jax.tree.leaves(states[False]),
                      jax.tree.leaves(states[True])):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

"""Global BA over a real tracked MapState, sharded across the CPU mesh
(the large-scale backend path, BASELINE config 5)."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kbslam.config import SLAMConfig, OrbConfig, PnPConfig, MapConfig
from kbslam.ba.global_ba import GlobalBAData, from_map_state, global_ba_step, write_back
from kbslam.io.synthetic import render_sequence
from kbslam.slam import SLAM


def test_global_ba_over_tracked_map():
    seq = render_sequence(num_frames=40, height=240, width=320)
    cfg = SLAMConfig(
        image_height=240, image_width=320,
        orb=OrbConfig(num_features=512, num_levels=4, max_features=512),
        pnp=PnPConfig(num_hypotheses=128),
        map=MapConfig(max_keyframes=16, max_map_points=8192),
    )
    slam = SLAM(cfg, seq.K, ba_mode="disabled", use_mask=False)
    for i in range(40):
        slam.process(seq.rgb[i], seq.depth[i])
    state = slam.state.map
    n_kf = int(state.num_kf)
    assert n_kf >= 3

    n_cams = 8  # multiple of the mesh size; > n_kf pads with unreal cams
    data, slots, real = from_map_state(state, slam.intr, cfg.ba, n_cams)
    assert int(jnp.sum(data.active)) > 50

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("stream",))
    shard = NamedSharding(mesh, P("stream"))
    rep = NamedSharding(mesh, P())
    data = GlobalBAData(
        *[jax.device_put(x, shard) for x in data[:9]],
        jax.device_put(data.mp_pos, rep),
        jax.device_put(data.anchor_mp, rep),
    )

    costs = []
    for _ in range(4):
        data, cost = global_ba_step(data, slam.intr, mesh, pcg_iters=20,
                                    damping=1e-4)
        costs.append(float(cost))
    assert costs[-1] <= costs[0] * 1.001
    assert np.isfinite(costs).all()

    new_state = write_back(state, data, slots, real)
    assert np.all(np.isfinite(np.asarray(new_state.kf_t)))
    # gauge: oldest real keyframe pose unchanged
    oldest = int(jnp.argmax(real.astype(jnp.int32)))
    s = int(slots[oldest])
    np.testing.assert_array_equal(np.asarray(new_state.kf_t[s]),
                                  np.asarray(state.kf_t[s]))


def test_global_ba_depth_rows_improves_keyframes():
    """Global BA with the RGB-D depth rows (depth_rows=True) on a real
    tracked map: monotone costs AND keyframe poses at least as close to
    ground truth as the reprojection-only solve (the depth rows pin the
    planar-scene valley — same rationale as the local window,
    BAConfig.depth_residuals)."""
    from kbslam.ba.global_ba import global_ba_solve
    from kbslam.eval.trajectory import ate_rmse

    seq = render_sequence(num_frames=40, height=240, width=320)
    cfg = SLAMConfig(
        image_height=240, image_width=320,
        orb=OrbConfig(num_features=512, num_levels=4, max_features=512),
        pnp=PnPConfig(num_hypotheses=128),
        map=MapConfig(max_keyframes=16, max_map_points=8192),
    )
    slam = SLAM(cfg, seq.K, ba_mode="disabled", use_mask=False)
    for i in range(40):
        slam.process(seq.rgb[i], seq.depth[i])
    state = slam.state.map
    kf_frames = [d["frame"] for d in slam.diagnostics if d["added_kf"]]
    gt_kf = seq.poses[kf_frames][:, :3, 3]

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("stream",))
    shard = NamedSharding(mesh, P("stream"))
    rep = NamedSharding(mesh, P())

    def solve(depth_rows):
        data, slots, real = from_map_state(state, slam.intr, cfg.ba, 8)
        data = GlobalBAData(
            *[jax.device_put(x, shard) for x in data[:9]],
            jax.device_put(data.mp_pos, rep),
            jax.device_put(data.anchor_mp, rep),
        )
        data, costs = global_ba_solve(data, slam.intr, mesh, iters=5,
                                      pcg_iters=25, depth_rows=depth_rows)
        g = np.asarray(costs)
        assert np.all(np.isfinite(g))
        assert np.all(np.diff(g) <= 1e-4 * g[:-1] + 1e-6)
        ns = write_back(state, data, slots, real)
        ids = np.asarray(ns.kf_id)
        kf_t = np.asarray(ns.kf_t)[ids >= 0]
        return ate_rmse(kf_t, gt_kf)

    ate_repro = solve(False)
    ate_depth = solve(True)
    assert ate_depth <= ate_repro + 1e-3, (ate_depth, ate_repro)

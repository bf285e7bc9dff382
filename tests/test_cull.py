"""Keyframe culling parity tests (Map.cpp:107-177 keep-decision logic)."""
import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from kbslam.config import CullConfig, MapConfig, OrbConfig
from kbslam.geom.se3 import SE3
from kbslam.mapping.cull import cull_decision, cull_keyframes
from kbslam.mapping.state import empty_map, insert_keyframe
from tests.test_mapstate import fake_feats

CFG = CullConfig(enabled=True)


def poses_from_xyz(xyz):
    n = len(xyz)
    q = np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(np.asarray(xyz, np.float32))


def test_small_maps_untouched():
    q, t = poses_from_xyz([[0, 0, 0], [0.1, 0, 0], [0.2, 0, 0]])
    keep = cull_decision(q, t, jnp.ones(3, bool), CFG)
    assert np.asarray(keep).all()  # <= min_keep: reference returns early


def test_static_middle_culled_but_min_kept():
    # 8 nearly-static keyframes: middles fail the motion test; first and
    # last always kept; backfill from second-newest to reach min_keep=5
    xyz = [[0.01 * i, 0, 0] for i in range(8)]
    q, t = poses_from_xyz(xyz)
    keep = np.asarray(cull_decision(q, t, jnp.ones(8, bool), CFG))
    assert keep[0] and keep[7]
    assert keep.sum() == 5
    # backfill picks newest non-last candidates: 6, 5, 4
    assert keep[6] and keep[5] and keep[4]
    assert not keep[1] and not keep[2] and not keep[3]


def test_moving_keyframes_kept():
    xyz = [[2.0 * i, 0, 0] for i in range(8)]  # 2 m apart > 1.5 m threshold
    q, t = poses_from_xyz(xyz)
    keep = np.asarray(cull_decision(q, t, jnp.ones(8, bool), CFG))
    assert keep.all()


def test_rotation_triggers_keep():
    n = 8
    qs, ts = [], []
    for i in range(n):
        R = Rotation.from_rotvec([0, 0.2 * i, 0])  # 0.2 rad > 0.1 threshold
        qs.append(R.as_quat(scalar_first=True))
        ts.append([0, 0, 0])
    keep = np.asarray(
        cull_decision(jnp.asarray(np.asarray(qs, np.float32)),
                      jnp.asarray(np.asarray(ts, np.float32)),
                      jnp.ones(n, bool), CFG))
    assert keep.all()


def test_cull_keyframes_invalidates_and_cleans_landmarks():
    mcfg = MapConfig(max_keyframes=16, max_map_points=64)
    ocfg = OrbConfig(max_features=8, num_levels=1)
    rng = np.random.default_rng(0)
    m = empty_map(mcfg, ocfg)
    for i in range(8):
        pose = SE3.identity()._replace(t=jnp.array([0.01 * i, 0.0, 0.0]))
        m = insert_keyframe(m, fake_feats(rng), jnp.ones(8), pose)
    # give KF1 (will be culled) sole extra obs of landmark 7; landmark 5
    # observed by two surviving KFs
    m = m._replace(
        kf_mp=m.kf_mp.at[1, 0].set(7).at[0, 1].set(5).at[7, 1].set(5)
    )
    out = cull_keyframes(m, CFG)
    ids = np.asarray(out.kf_id)
    assert ids[0] == 0 and ids[7] == 7  # endpoints kept
    assert (ids >= 0).sum() == 5
    kf_mp = np.asarray(out.kf_mp)
    assert (kf_mp[1] == -1).all()       # culled KF's slots cleared
    # landmark 7 had only the culled obs -> gone everywhere; landmark 5
    # keeps both surviving observations
    assert not (kf_mp == 7).any()
    assert (kf_mp == 5).sum() == 2

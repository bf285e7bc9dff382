"""Submap TSDF atlas (mapping/submap.py) — a dense model that follows
BA/loop-closure corrections, vs the deliberately-rigid monolithic
volume (mapping/dense.py limitations note). Capability extension: the
reference has no dense world model at all (MapPoint.hpp)."""
import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from kbslam.config import (DenseMapConfig, KeyframePolicyConfig, MapConfig,
                           OrbConfig, PnPConfig, SLAMConfig)
from kbslam.geom.camera import Intrinsics
from kbslam.geom.se3 import SE3
from kbslam.io.synthetic import render_sequence
from kbslam.mapping.dense import empty_tsdf, integrate
from kbslam.mapping.submap import (SubmapAtlas, empty_atlas,
                                   extract_atlas_surface, integrate_active,
                                   live_slots, start_submap)
from kbslam.slam import SLAM, pose_T


def _scene(T=8):
    seq = render_sequence(num_frames=T, height=120, width=160,
                          scene="spheres")
    return seq, Intrinsics.from_matrix(seq.K)


def _gt_se3(seq, i):
    return SE3.from_matrix(jnp.asarray(seq.poses[i], jnp.float32))


def test_identity_anchor_matches_monolithic():
    """One submap anchored at the identity == the monolithic volume:
    the local frame is then the world frame, so fusing the same frames
    must produce the same field."""
    seq, intr = _scene(T=4)
    cfg = DenseMapConfig(dims=(48, 48, 24), voxel_size=0.17,
                         origin=(-4.08, -4.08, -1.36))
    atlas = empty_atlas(cfg, num_submaps=3)
    atlas = start_submap(atlas, jnp.array([1.0, 0, 0, 0]), jnp.zeros(3),
                         kf_id=0)
    mono = empty_tsdf(cfg)
    for i in range(4):
        d = jnp.asarray(seq.depth[i].astype(np.float32) * 0.001)
        p = _gt_se3(seq, i)
        atlas = integrate_active(atlas, d, p.q, p.t, intr, cfg)
        mono = integrate(mono, d, p, intr, cfg)
    slot = int(atlas.active_slot())
    np.testing.assert_allclose(np.asarray(atlas.tsdf[slot]),
                               np.asarray(mono.tsdf), atol=1e-6)
    np.testing.assert_allclose(np.asarray(atlas.weight[slot]),
                               np.asarray(mono.weight), atol=0)


def test_correction_reposes_submap_rigidly():
    """Extraction re-poses each submap by its anchor's CURRENT pose:
    handing a corrected anchor pose must move every extracted point by
    exactly that rigid correction."""
    seq, intr = _scene(T=3)
    # finer grid than the equivalence test: at 120x160 the frustum is
    # narrow, and the extracted-point count scales with voxels-in-band
    cfg = DenseMapConfig(dims=(48, 48, 28), voxel_size=0.1,
                         origin=(-2.4, -2.4, 0.2))
    anchor = _gt_se3(seq, 0)
    atlas = empty_atlas(cfg, num_submaps=2)
    atlas = start_submap(atlas, anchor.q, anchor.t, kf_id=7)
    for i in range(3):
        d = jnp.asarray(seq.depth[i].astype(np.float32) * 0.001)
        p = _gt_se3(seq, i)
        atlas = integrate_active(atlas, d, p.q, p.t, intr, cfg)

    A = np.asarray(anchor.matrix())
    pts0, res0 = extract_atlas_surface(atlas, cfg, {7: A})
    assert pts0.shape[0] > 100

    # frozen-fallback path: no pose handed in -> same result (the
    # stored creation pose IS A)
    pts_frozen, _ = extract_atlas_surface(atlas, cfg, {})
    np.testing.assert_allclose(pts_frozen, pts0, atol=1e-5)

    D = np.asarray(SE3.exp(jnp.array([0.3, -0.2, 0.1,
                                      0.05, -0.04, 0.06])).matrix())
    pts1, res1 = extract_atlas_surface(atlas, cfg, {7: D @ A})
    np.testing.assert_allclose(res1, res0)
    np.testing.assert_allclose(pts1, pts0 @ D[:3, :3].T + D[:3, 3],
                               atol=1e-4)


def test_ring_overwrite_and_live_slots():
    cfg = DenseMapConfig(dims=(8, 8, 8), voxel_size=0.2)
    atlas = empty_atlas(cfg, num_submaps=2)
    for k in range(3):
        atlas = start_submap(atlas, jnp.array([1.0, 0, 0, 0]),
                             jnp.full(3, float(k)), kf_id=10 + k)
    assert int(atlas.count) == 3
    # oldest-first live slots: submap 1 (slot 1), submap 2 (slot 0)
    np.testing.assert_array_equal(live_slots(atlas), [1, 0])
    ids = np.asarray(atlas.anchor_kf_id)
    assert ids[0] == 12 and ids[1] == 11  # slot 0 was overwritten
    # the overwritten slot restarted empty
    assert float(atlas.weight[0].sum()) == 0.0


def _slam_cfg(submap_every):
    cfg = SLAMConfig(
        image_height=240, image_width=320,
        orb=OrbConfig(num_features=512, num_levels=4, max_features=512),
        pnp=PnPConfig(num_hypotheses=128),
        policy=KeyframePolicyConfig(min_frame_gap=3),
        map=MapConfig(max_keyframes=32, max_map_points=16384),
    )
    return cfg.replace(dense=dataclasses.replace(
        cfg.dense, enabled=True, submap_every=submap_every,
        max_submaps=8))


def test_slam_submap_end_to_end():
    """e2e on tracked poses: submaps open at the configured cadence,
    the union surface reconstructs the scene about as well as the
    monolithic volume does on a short (drift-free-ish) run, and
    dense_mesh returns a non-empty concatenated mesh."""
    T = 24
    seq = render_sequence(num_frames=T, height=240, width=320,
                          scene="spheres")
    s = SLAM(_slam_cfg(submap_every=2), seq.K, ba_mode="on_keyframe",
             use_mask=False)
    for i in range(T):
        s.process(seq.rgb[i], seq.depth[i])
    n_kf = sum(d["added_kf"] for d in s.diagnostics)
    assert int(s.atlas.count) == (n_kf + 1) // 2, (int(s.atlas.count),
                                                   n_kf)
    pts, _ = s.dense_surface()
    assert pts.shape[0] > 500

    # sanity vs the plane: most of the scene is the z=0 plane in the GT
    # world; the submap union must reconstruct it to centimetres like
    # the monolithic e2e gate (tests/test_dense.py)
    T0 = seq.poses[0]
    pts_gt = pts @ T0[:3, :3].T + T0[:3, 3]
    near_plane = np.abs(pts_gt[:, 2]) < 0.3
    assert near_plane.mean() > 0.5
    assert np.median(np.abs(pts_gt[near_plane, 2])) < 0.03

    mesh = s.dense_mesh()
    assert mesh.vertices.shape[0] > 100
    assert mesh.faces.shape[0] > 100


def test_slam_submap_follows_ring_correction():
    """The wiring claim: perturbing an anchor keyframe's RING pose (as
    loop closure / BA writeback would) must rigidly move that submap's
    extracted points, while other submaps stay put."""
    T = 24
    seq = render_sequence(num_frames=T, height=240, width=320,
                          scene="spheres")
    s = SLAM(_slam_cfg(submap_every=1), seq.K, ba_mode="disabled",
             use_mask=False)
    for i in range(T):
        s.process(seq.rgb[i], seq.depth[i])
    assert int(s.atlas.count) >= 3
    pts0, _ = s.dense_surface()

    # perturb the LAST anchor's ring pose
    m = s.state.map
    ids = np.asarray(s.atlas.anchor_kf_id)
    last_slot = int(s.atlas.active_slot())
    kid = int(ids[last_slot])
    ring_slot = kid % int(m.kf_q.shape[0])
    dT = SE3.exp(jnp.array([0.5, 0.0, 0.0, 0.0, 0.0, 0.0]))
    old = SE3(m.kf_q[ring_slot], m.kf_t[ring_slot])
    new = dT @ old
    s.state = s.state._replace(map=m._replace(
        kf_q=m.kf_q.at[ring_slot].set(new.q),
        kf_t=m.kf_t.at[ring_slot].set(new.t)))

    pts1, _ = s.dense_surface()
    assert pts1.shape == pts0.shape
    moved = np.linalg.norm(pts1 - pts0, axis=1)
    # some points moved by exactly the 0.5 m shift, the rest not at all
    assert (moved > 0.49).any() and (moved < 1e-6).any()
    assert ((moved < 1e-6) | (moved > 0.49)).all()


def test_cli_dense_submaps_smoke():
    import json
    import sys
    from io import StringIO

    from kbslam.cli import main

    argv = ["--source", "synthetic", "--frames", "12",
            "--width", "160", "--height", "120",
            "--ba", "off", "--dense", "--dense-submaps", "2"]
    cap = StringIO()
    old = sys.stdout
    sys.stdout = cap
    try:
        main(argv)
    finally:
        sys.stdout = old
    summary = json.loads(cap.getvalue().strip().splitlines()[-1])
    assert summary["tsdf_submaps"] >= 1
    assert summary["tsdf_surface_points"] > 0


def test_atlas_checkpoint_roundtrip(tmp_path):
    """--save-checkpoint persists the submap atlas (tsdf/weight rings,
    anchors, count, insertion phase) and --resume restores it bit-
    identically; the submap-every-K cadence continues in phase."""
    import dataclasses
    import json
    import sys
    from io import StringIO

    import jax.numpy as jnp

    from kbslam.cli import main
    from kbslam.config import DEFAULT_CONFIG
    from kbslam.io.checkpoint import load_checkpoint_atlas

    ckpt = tmp_path / "c.npz"

    def run(argv):
        cap = StringIO()
        old = sys.stdout
        sys.stdout = cap
        try:
            main(argv)
        finally:
            sys.stdout = old
        return json.loads(cap.getvalue().strip().splitlines()[-1])

    base = ["--source", "synthetic", "--frames", "16",
            "--width", "160", "--height", "120", "--ba", "off",
            "--dense", "--dense-submaps", "2"]
    s1 = run(base + ["--save-checkpoint", str(ckpt)])
    assert s1["tsdf_submaps"] >= 1

    cfg = DEFAULT_CONFIG.replace(image_height=120, image_width=160)
    cfg = cfg.replace(dense=dataclasses.replace(
        cfg.dense, enabled=True, submap_every=2))
    atlas, kf_ins = load_checkpoint_atlas(str(ckpt), cfg)
    assert atlas is not None
    assert kf_ins == s1["keyframes"]
    assert int(atlas.count) == s1["tsdf_submaps"]
    assert int((np.asarray(atlas.weight) > 0).sum()) \
        == s1["tsdf_observed_voxels"]

    # wrong ring capacity must be rejected, not silently reshaped
    bad = cfg.replace(dense=dataclasses.replace(cfg.dense,
                                                max_submaps=4))
    with pytest.raises(ValueError):
        load_checkpoint_atlas(str(ckpt), bad)

    # CLI resume: the atlas continues (>= voxels, >= submaps), and a
    # checkpoint written WITHOUT submaps warns instead of loading
    s2 = run(base + ["--resume", str(ckpt)])
    assert s2["tsdf_observed_voxels"] >= s1["tsdf_observed_voxels"]
    assert s2["tsdf_submaps"] >= s1["tsdf_submaps"]


def test_mid_submap_correction_fuses_gauge_consistently():
    """Gauge rule (integrate_active docstring): fusion must use the
    anchor's pose in the SAME gauge as the frame pose. If a rigid
    correction D fires mid-submap (anchor ring pose becomes D*A and
    subsequent frame poses arrive as D*P), the chunk's LOCAL content
    must be unchanged — (D*A)^-1 (D*P) == A^-1 P. The pre-fix code
    froze the creation anchor A, baking D into the chunk and letting
    extraction (which re-poses by D*A) apply it twice."""
    seq, intr = _scene(T=3)
    cfg = DenseMapConfig(dims=(48, 48, 28), voxel_size=0.1,
                         origin=(-2.4, -2.4, 0.2))
    A = _gt_se3(seq, 0)
    D = SE3.exp(jnp.array([0.2, -0.1, 0.05, 0.03, -0.02, 0.04]))

    def fuse(atlas, i, frame, anchor):
        d = jnp.asarray(seq.depth[i].astype(np.float32) * 0.001)
        return integrate_active(atlas, d, frame.q, frame.t, intr, cfg,
                                anchor.q, anchor.t)

    # reference: the whole submap fused in one gauge (no correction)
    ref = start_submap(empty_atlas(cfg, 2), A.q, A.t, kf_id=7)
    for i in range(3):
        ref = fuse(ref, i, _gt_se3(seq, i), A)

    # correction D fires after frame 1: frame 2's pose and the anchor's
    # ring pose both live in the corrected gauge
    cor = start_submap(empty_atlas(cfg, 2), A.q, A.t, kf_id=7)
    for i in range(2):
        cor = fuse(cor, i, _gt_se3(seq, i), A)
    cor = fuse(cor, 2, D @ _gt_se3(seq, 2), D @ A)

    slot = int(ref.active_slot())
    dt = np.abs(np.asarray(cor.tsdf[slot]) - np.asarray(ref.tsdf[slot]))
    dw = np.abs(np.asarray(cor.weight[slot])
                - np.asarray(ref.weight[slot]))
    # identical local fields up to f32 pose-compose noise (allow a few
    # nearest-neighbor boundary flips)
    assert (dt > 2e-3).mean() < 1e-3, (dt.max(), (dt > 2e-3).mean())
    assert (dw > 0).mean() < 1e-3

    # and the stored anchor now reflects the corrected gauge, so the
    # frozen-fallback extraction stays consistent with newest content
    DA = np.asarray((D @ A).matrix())
    got = np.asarray(SE3(cor.anchor_q[slot],
                         cor.anchor_t[slot]).matrix())
    np.testing.assert_allclose(got, DA, atol=1e-5)


def test_chunked_submaps_match_per_frame_path():
    """The chunked executor's atlas path (streaming.py) fuses the same
    keyframes at the same drained poses with the same anchor gauge the
    per-frame shell does (chunked == per-frame tracking is pinned in
    test_streaming.py), so with BA off the whole atlas must come out
    identical — fields, anchors, and the ring counter."""
    from kbslam.pipeline import init_state
    from kbslam.streaming import ChunkedStream

    T = 24
    seq = render_sequence(num_frames=T, height=240, width=320,
                          scene="spheres")
    cfg = _slam_cfg(submap_every=2)
    intr = Intrinsics.from_matrix(seq.K)

    s = SLAM(cfg, seq.K, ba_mode="disabled", use_mask=False)
    for i in range(T):
        s.process(seq.rgb[i], seq.depth[i])

    cs = ChunkedStream(cfg, intr, init_state(cfg), chunk=8)
    got = []
    for i in range(T):
        got += cs.feed(seq.rgb[i], seq.depth[i])
    got += cs.flush()
    assert len(got) == T
    assert not cs._depth_ring, "depth ring must drain"

    assert int(cs.atlas.count) == int(s.atlas.count) >= 2
    np.testing.assert_array_equal(np.asarray(cs.atlas.anchor_kf_id),
                                  np.asarray(s.atlas.anchor_kf_id))
    np.testing.assert_allclose(np.asarray(cs.atlas.anchor_q),
                               np.asarray(s.atlas.anchor_q))
    np.testing.assert_allclose(np.asarray(cs.atlas.anchor_t),
                               np.asarray(s.atlas.anchor_t))
    np.testing.assert_allclose(np.asarray(cs.atlas.weight),
                               np.asarray(s.atlas.weight))
    np.testing.assert_allclose(np.asarray(cs.atlas.tsdf),
                               np.asarray(s.atlas.tsdf), atol=1e-6)
    # extraction agrees too (both read their own live map rings)
    p1, _ = s.dense_surface()
    p2, _ = cs.dense_surface()
    np.testing.assert_allclose(p2, p1, atol=1e-5)


def test_chunked_submaps_with_async_ba():
    """Composition: chunk-late async-BA merges move ring poses between
    fusions; the chunked atlas path must keep fusing in the corrected
    anchor gauge (integrate_active docstring) and extraction must keep
    working."""
    from kbslam.pipeline import init_state
    from kbslam.streaming import ChunkedStream

    T = 24
    seq = render_sequence(num_frames=T, height=240, width=320,
                          scene="spheres", depth_noise_mm=3.0)
    cfg = _slam_cfg(submap_every=2)
    intr = Intrinsics.from_matrix(seq.K)
    cs = ChunkedStream(cfg, intr, init_state(cfg), chunk=6,
                       ba_mode="async")
    got = []
    for i in range(T):
        got += cs.feed(seq.rgb[i], seq.depth[i])
    got += cs.flush()
    assert len(got) == T
    assert len(cs.ba_stats) >= 1, "async BA must have solved"
    assert int(cs.atlas.count) >= 2
    pts, _ = cs.dense_surface()
    assert pts.shape[0] > 200


def test_cli_chunked_submaps_roundtrip(tmp_path):
    """CLI surface: --chunk composes with --dense-submaps (fusion runs
    chunk-late like the monolithic path), the summary reports the atlas,
    and checkpoint/resume carries it across chunked runs."""
    import json
    import sys
    from io import StringIO

    from kbslam.cli import main

    ckpt = tmp_path / "c.npz"

    def run(argv):
        cap = StringIO()
        old = sys.stdout
        sys.stdout = cap
        try:
            main(argv)
        finally:
            sys.stdout = old
        return json.loads(cap.getvalue().strip().splitlines()[-1])

    base = ["--source", "synthetic", "--frames", "16",
            "--width", "160", "--height", "120", "--ba", "off",
            "--chunk", "4", "--dense", "--dense-submaps", "2"]
    s1 = run(base + ["--save-checkpoint", str(ckpt)])
    assert s1["tsdf_submaps"] >= 1
    assert s1["tsdf_surface_points"] > 0
    assert s1["tsdf_observed_voxels"] > 0

    s2 = run(base + ["--resume", str(ckpt)])
    assert s2["tsdf_observed_voxels"] >= s1["tsdf_observed_voxels"]
    assert s2["tsdf_submaps"] >= s1["tsdf_submaps"]


def test_fusion_poses_live_ring_gauge_and_insertion_bound():
    """streaming._fusion_poses_now pins three behaviors: (a) on the
    live path BOTH the frame pose and the anchor pose are sliced from
    the live ring at the same instant — one gauge, so a loop/pose-graph
    correction that merged while the chunk was in flight (rewriting the
    whole ring) reaches both poses, never only the anchor; (b) the
    liveness bound counts possible in-flight INSERTIONS (the device
    step inserts only via the >= min_frame_gap policy), not raw frames,
    so realistic chunk sizes keep the gauge-following path engaged —
    the frame-counting bound disabled it for chunk >= ~32; (c) a
    possible ring wrap falls back to the drained frame pose + the
    stored anchor pose (one frozen gauge)."""
    from types import SimpleNamespace

    from kbslam.streaming import ChunkedStream

    cap = 64
    kf_q = np.arange(cap * 4, dtype=np.float32).reshape(cap, 4)
    kf_t = np.arange(cap * 3, dtype=np.float32).reshape(cap, 3)
    atlas = SimpleNamespace(capacity=2,
                            anchor_q=-np.ones((2, 4), np.float32),
                            anchor_t=-np.ones((2, 3), np.float32))

    def make(anchor_kid, inflight, gap):
        return SimpleNamespace(
            _active_anchor_kid=anchor_kid, _fed=1000 + inflight,
            _frame=1000, _min_frame_gap=gap, _kf_cap=cap,
            state=SimpleNamespace(map=SimpleNamespace(kf_q=kf_q,
                                                      kf_t=kf_t)),
            atlas=atlas, _submaps_opened=1)

    fpn = ChunkedStream._fusion_poses_now
    qd = np.full(4, 99.0, np.float32)
    td = np.full(3, 99.0, np.float32)

    # (a)+(b): 64 frames in flight (chunk 32, double-buffered), gap 10
    # -> at most 6 insertions beyond kid: live, both poses from the ring
    q, t, aq, at = fpn(make(3, 64, 10), 5, qd, td)
    np.testing.assert_array_equal(q, kf_q[5])
    np.testing.assert_array_equal(t, kf_t[5])
    np.testing.assert_array_equal(aq, kf_q[3])
    np.testing.assert_array_equal(at, kf_t[3])

    # (b) inverse: gap 1 makes every in-flight frame a possible
    # insertion -> the same 64 frames can wrap the anchor slot: fallback
    q, t, aq, at = fpn(make(3, 64, 1), 5, qd, td)
    np.testing.assert_array_equal(q, qd)
    np.testing.assert_array_equal(aq, atlas.anchor_q[0])

    # (c): kid already >= anchor + cap (drained wrap): fallback
    q, t, aq, at = fpn(make(3, 0, 10), 3 + cap, qd, td)
    np.testing.assert_array_equal(q, qd)
    np.testing.assert_array_equal(t, td)
    np.testing.assert_array_equal(aq, atlas.anchor_q[0])
    np.testing.assert_array_equal(at, atlas.anchor_t[0])


def test_chunked_submaps_survive_kf_ring_wrap():
    """The chunked anchor-liveness check is conservative and host-only
    (streaming._fusion_poses_now): once the keyframe ring COULD have
    reallocated the anchor's slot, fusion falls back to the drained
    frame pose + the atlas's stored anchor pose. With BA off the stored
    pose equals the ring pose, so the chunked atlas must still match
    the per-frame one exactly even when insertions wrap a tiny ring
    mid-submap."""
    from kbslam.pipeline import init_state
    from kbslam.streaming import ChunkedStream

    T = 24
    seq = render_sequence(num_frames=T, height=120, width=160,
                          scene="spheres")
    cfg = SLAMConfig(
        image_height=120, image_width=160,
        orb=OrbConfig(num_features=256, num_levels=3, max_features=256),
        pnp=PnPConfig(num_hypotheses=64),
        # frequent insertions into a 4-slot ring: the ring wraps while
        # the first (and only) submap is still active
        policy=KeyframePolicyConfig(min_frame_gap=1,
                                    rotation_threshold_deg=0.1),
        map=MapConfig(max_keyframes=4, max_map_points=4096),
    )
    cfg = cfg.replace(dense=dataclasses.replace(
        cfg.dense, enabled=True, submap_every=64, max_submaps=2))
    intr = Intrinsics.from_matrix(seq.K)

    s = SLAM(cfg, seq.K, ba_mode="disabled", use_mask=False)
    for i in range(T):
        s.process(seq.rgb[i], seq.depth[i])
    n_ins = sum(d["added_kf"] for d in s.diagnostics)
    assert n_ins > 4, f"need a ring wrap, got {n_ins} insertions"
    assert int(s.atlas.count) == 1  # one submap spans the whole run

    cs = ChunkedStream(cfg, intr, init_state(cfg), chunk=8)
    got = []
    for i in range(T):
        got += cs.feed(seq.rgb[i], seq.depth[i])
    got += cs.flush()
    assert len(got) == T
    # the wrap actually exercised the fallback branch on the chunked
    # side: with a 4-slot ring and up to 16 frames in flight, the
    # conservative check must have rejected the ring read at least once
    assert cs._kf_insertions == n_ins

    np.testing.assert_allclose(np.asarray(cs.atlas.weight),
                               np.asarray(s.atlas.weight))
    np.testing.assert_allclose(np.asarray(cs.atlas.tsdf),
                               np.asarray(s.atlas.tsdf), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cs.atlas.anchor_q),
                               np.asarray(s.atlas.anchor_q))
    np.testing.assert_allclose(np.asarray(cs.atlas.anchor_t),
                               np.asarray(s.atlas.anchor_t))

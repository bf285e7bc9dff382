"""IO layer tests: TUM reader on a generated fixture, ZMQ camera
round-trip against the test-double publisher, viewer schema."""
import os
import threading
import time

import numpy as np
import pytest

from kbslam.io.synthetic import render_sequence


@pytest.fixture(scope="module")
def tum_fixture(tmp_path_factory):
    """Write a tiny TUM-format dataset from the synthetic renderer."""
    from PIL import Image
    from scipy.spatial.transform import Rotation

    root = tmp_path_factory.mktemp("tum_seq")
    seq = render_sequence(num_frames=6, height=120, width=160)
    os.makedirs(root / "rgb")
    os.makedirs(root / "depth")
    rgb_lines, d_lines, gt_lines = [], [], []
    for i in range(6):
        t = 1000.0 + i * 0.033
        rp = f"rgb/{t:.6f}.png"
        dp = f"depth/{t:.6f}.png"
        Image.fromarray(seq.rgb[i]).save(root / rp)
        # TUM depth scale is 5000/m; synthetic is mm -> rescale
        d = (seq.depth[i].astype(np.float64) * 5.0).astype(np.uint16)
        Image.fromarray(d).save(root / dp)
        rgb_lines.append(f"{t:.6f} {rp}")
        d_lines.append(f"{t + 0.001:.6f} {dp}")
        T = seq.poses[i]
        q = Rotation.from_matrix(T[:3, :3]).as_quat()
        gt_lines.append(
            f"{t:.6f} {T[0,3]} {T[1,3]} {T[2,3]} {q[0]} {q[1]} {q[2]} {q[3]}")
    (root / "rgb.txt").write_text("# rgb\n" + "\n".join(rgb_lines))
    (root / "depth.txt").write_text("# depth\n" + "\n".join(d_lines))
    (root / "groundtruth.txt").write_text("# gt\n" + "\n".join(gt_lines))
    return root, seq


def test_tum_reader(tum_fixture):
    from kbslam.io.tum import TUMDataset

    root, seq = tum_fixture
    ds = TUMDataset(str(root))
    assert len(ds) == 6
    frames = list(ds)
    rgb, depth, mask, gt = frames[0]
    assert rgb.shape == (120, 160, 3) and rgb.dtype == np.uint8
    assert depth.dtype == np.uint16
    # depth scale round trip: u16 * (1/5000) == synthetic metres
    got_m = depth.astype(np.float64) * ds.depth_scale
    want_m = seq.depth[0].astype(np.float64) * 1e-3
    np.testing.assert_allclose(got_m, want_m, atol=2e-4)
    # ground truth associated
    np.testing.assert_allclose(gt, seq.poses[0], atol=1e-6)


def test_zmq_round_trip():
    zmq = pytest.importorskip("zmq")
    from kbslam.io.zmq_camera import FramePublisher, ZMQCamera

    endpoint_pub = "tcp://*:5711"
    endpoint_sub = "tcp://localhost:5711"
    pub = FramePublisher(endpoint_pub)
    cam = ZMQCamera(endpoint_sub, timeout_s=10.0)
    time.sleep(0.3)  # PUB/SUB join

    K = np.array([[100.0, 0, 50], [0, 100, 40], [0, 0, 1]])
    rgb = np.random.default_rng(0).integers(0, 255, (120, 160, 3), dtype=np.uint8)
    depth = np.random.default_rng(1).integers(0, 5000, (120, 160), dtype=np.uint16)

    # intrinsics handshake (retry until the SUB is joined)
    got_K = None
    for _ in range(50):
        pub.publish_intrinsics(K, dist=[0.1, 0, 0, 0, 0])
        try:
            got_K, dist = cam.get_intrinsics()
            break
        except TimeoutError:
            continue
    np.testing.assert_allclose(got_K, K)
    np.testing.assert_allclose(dist[0], 0.1)

    pub.publish_frame(rgb, depth)
    frames = cam.grab_frames(timeout=5.0)
    assert frames is not None
    r, d, m = frames
    np.testing.assert_array_equal(r, rgb)
    np.testing.assert_array_equal(d, depth)
    assert m.shape == (120, 160)

    # end-of-stream marker -> None (reference empty-message contract)
    pub.publish_end()
    time.sleep(0.2)
    assert cam.grab_frames(timeout=2.0) is None
    cam.close()
    pub.close()


def test_viewer_noop_schema():
    from kbslam.viz.rerun_viewer import Viewer

    v = Viewer(spawn=False)
    traj = np.array([[1.0, 2.0, 3.0]])
    v.update(traj, traj, traj)
    # display remap (x, -z, -y) — Map.cpp:86,96
    np.testing.assert_allclose(v.last["trajectory"], [[1.0, -3.0, -2.0]])
    # dense TSDF cloud rides the same remap (/world/dense extension)
    v.update_dense(traj)
    np.testing.assert_allclose(v.last["dense"], [[1.0, -3.0, -2.0]])
    # mesh entity: remapped vertices + rewound faces (the det=-1 remap
    # flips orientation; index swap 1<->2 restores outward normals)
    from kbslam.mapping.mesh import TriangleMesh

    mesh = TriangleMesh(
        vertices=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        faces=np.array([[0, 1, 2]], np.int32))
    v.update_dense_mesh(mesh)
    mv, mf = v.last["dense_mesh"]
    np.testing.assert_allclose(mv, [[0, 0, 0], [1, 0, 0], [0, 0, -1]])
    np.testing.assert_array_equal(mf, [[0, 2, 1]])
    # winding preserved through the remap: normal direction maps with
    # the same (x,-z,-y) transform
    n_orig = np.cross(mesh.vertices[1] - mesh.vertices[0],
                      mesh.vertices[2] - mesh.vertices[0])
    n_disp = np.cross(mv[mf[0, 1]] - mv[mf[0, 0]],
                      mv[mf[0, 2]] - mv[mf[0, 0]])
    np.testing.assert_allclose(
        n_disp, [n_orig[0], -n_orig[2], -n_orig[1]])


def test_cli_tum_source(tum_fixture, capsys):
    """--source tum:<dir> end-to-end (reader + native loader + eval)."""
    from kbslam.cli import main

    root, seq = tum_fixture
    main(["--source", f"tum:{root}", "--frames", "6", "--width", "160",
          "--height", "120", "--ba", "off", "--eval"])
    import json

    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["frames"] == 6
    assert "ate_rmse_m" in s


def test_cli_synthetic_smoke(capsys):
    from kbslam.cli import main

    main(["--source", "synthetic", "--frames", "6", "--width", "160",
          "--height", "120", "--ba", "off", "--eval"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    import json

    s = json.loads(out)
    assert s["frames"] == 6
    assert "ate_rmse_m" in s


def test_cli_chunked_streaming_path(capsys):
    """--chunk routes frames through the chunked streaming executor
    (kbslam/streaming.py) with the same eval surface."""
    from kbslam.cli import main

    main(["--source", "synthetic", "--frames", "9", "--width", "160",
          "--height", "120", "--ba", "off", "--chunk", "4", "--gray",
          "--eval"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    import json

    s = json.loads(out)
    assert s["frames"] == 9
    assert s["chunk"] == 4 and s["gray_ingress"]
    assert s["success"] >= 7
    assert "ate_rmse_m" in s


def test_cli_chunked_checkpoint_cull_roundtrip(tmp_path, capsys):
    """The chunked path honors --cull and --save-checkpoint/--resume
    (ADVICE r2: these flags used to be silently dropped with --chunk)."""
    import json

    from kbslam.cli import main

    ckpt = str(tmp_path / "state.npz")
    main(["--source", "synthetic", "--frames", "8", "--width", "160",
          "--height", "120", "--ba", "off", "--chunk", "4", "--cull",
          "--save-checkpoint", ckpt])
    s1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s1["frames"] == 8 and s1["keyframes"] >= 1
    assert os.path.exists(ckpt)
    # chunked checkpoints carry the per-frame trajectory like the
    # per-frame path's (code-review r3 fix)
    with np.load(ckpt) as z:
        assert "trajectory" in z.files and z["trajectory"].shape == (8, 4, 4)

    main(["--source", "synthetic", "--frames", "8", "--width", "160",
          "--height", "120", "--ba", "off", "--chunk", "4", "--cull",
          "--resume", ckpt])
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # resumed map already holds the first run's keyframes: the same
    # opening frames re-track against it without re-inserting frame 0.
    # At the NK=1 reference-parity default (round 4) matching is vs the
    # NEWEST checkpoint keyframe only, so the earliest replayed frames
    # can lose one success vs the fresh run (they overlap an OLD
    # keyframe) — allow that single-frame slack; the machinery contract
    # (state restored, tracking functional) is what this pins.
    assert s2["frames"] == 8
    assert s2["success"] >= s1["success"] - 1
    assert s2["success"] >= 6


def test_tum_associate_one_to_one():
    """Jittery rgb timestamps must not pair two rgb frames with the same
    depth frame (standard TUM associate.py is one-to-one)."""
    from kbslam.io.tum import _associate

    rgb = [(1.000, "r0"), (1.010, "r1"), (1.040, "r2")]
    depth = [(1.008, "d0"), (1.042, "d1")]
    pairs = _associate(rgb, depth, max_dt=0.02)
    used_depth = [p[1][1] for p in pairs]
    assert len(used_depth) == len(set(used_depth)), used_depth
    # best-|dt| assignment: r1<->d0 (0.002 beats r0's 0.008), r2<->d1
    assert [(a[1], b[1]) for a, b in pairs] == [("r1", "d0"), ("r2", "d1")]


def test_zmq_close_joins_capture_thread():
    pytest.importorskip("zmq")
    from kbslam.io.zmq_camera import ZMQCamera

    cam = ZMQCamera("tcp://localhost:5733", timeout_s=5.0)
    t0 = time.time()
    cam.close()
    assert not cam._thread.is_alive()
    assert time.time() - t0 < 3.0  # poll slice, not the full timeout
    # a consumer arriving after close is not blocked
    assert cam.grab_frames(timeout=0.5) is None


def test_viewer_depth_jet_colorize():
    """Reference depth display: convertScaleAbs(alpha) + JET colormap
    (Viewer.cpp:66-68), not a raw DepthImage with a hardcoded meter."""
    from kbslam.viz.rerun_viewer import Viewer, colorize_depth, jet_colormap

    # JET endpoints: 0 -> dark blue, mid -> green-ish, 255 -> dark red
    ramp = jet_colormap(np.array([[0, 128, 255]], np.uint8))[0]
    assert ramp[0][2] > 100 and ramp[0][0] == 0      # blue end
    assert ramp[1][1] > 200                          # green middle
    assert ramp[2][0] > 100 and ramp[2][2] == 0      # red end

    depth = np.full((4, 4), 3000, np.uint16)         # 3 m at mm scale
    v = Viewer(spawn=False, depth_display_alpha=0.02)
    v.update(np.zeros((1, 3)), np.zeros((1, 3)), np.zeros((1, 3)),
             depth=depth)
    img = v.last["depth_rgb"]
    assert img.shape == (4, 4, 3) and img.dtype == np.uint8
    np.testing.assert_array_equal(img, colorize_depth(depth, 0.02))
    # 3000 * 0.02 = 60 -> blue-cyan region of JET
    assert img[0, 0, 2] > img[0, 0, 0]


def test_zmq_proto_round_trip():
    """Protobuf wire format (best-effort as-serializers schema,
    kbslam/io/proto/as_camera.proto): a proto-speaking publisher feeds
    the same subscriber — auto-detected, same end-to-end contract as
    the raw format (reference ingress Camera.cpp:43,74-79)."""
    pytest.importorskip("zmq")
    pytest.importorskip("google.protobuf")
    from kbslam.io.zmq_camera import FramePublisher, ZMQCamera

    pub = FramePublisher("tcp://*:5712", wire="proto")
    cam = ZMQCamera("tcp://localhost:5712", timeout_s=10.0)
    time.sleep(0.3)

    K = np.array([[525.0, 0, 319.5], [0, 525.0, 239.5], [0, 0, 1]])
    rgb = np.random.default_rng(2).integers(0, 255, (60, 80, 3), dtype=np.uint8)
    depth = np.random.default_rng(3).integers(0, 5000, (60, 80), dtype=np.uint16)
    mask = (np.random.default_rng(4).random((60, 80)) > 0.5).astype(np.uint8) * 255

    got_K = None
    for _ in range(50):
        pub.publish_intrinsics(K, dist=[0.25, 0, 0, 0, 0])
        try:
            got_K, dist = cam.get_intrinsics()
            break
        except TimeoutError:
            continue
    np.testing.assert_allclose(got_K, K)
    np.testing.assert_allclose(dist, [0.25, 0, 0, 0, 0])

    pub.publish_frame(rgb, depth, mask)
    frames = cam.grab_frames(timeout=5.0)
    assert frames is not None
    r, d, m = frames
    np.testing.assert_array_equal(r, rgb)
    np.testing.assert_array_equal(d, depth)
    np.testing.assert_array_equal(m, mask)

    pub.publish_end()
    time.sleep(0.2)
    assert cam.grab_frames(timeout=2.0) is None
    cam.close()
    pub.close()


def test_proto_intrinsics_full_coeffs_reach_model_guard():
    """An 8-coefficient (OpenCV rational-model) proto Intrinsics must NOT
    be silently truncated to 5 by the decoder — the full vector has to
    reach Intrinsics.from_matrix so its unsupported-model ValueError
    fires (code-review r3: the two wire formats validated inconsistently)."""
    pytest.importorskip("google.protobuf")
    from kbslam.geom.camera import Intrinsics
    from kbslam.io.zmq_camera import _pb2, _unpack_intrinsics

    buf = _pb2().Intrinsics(
        fx=525.0, fy=525.0, ppx=319.5, ppy=239.5,
        coeffs=[0.1, -0.2, 0.0, 0.0, 0.05, 0.3, 0.01, 0.002],
    ).SerializeToString()
    K, dist = _unpack_intrinsics(buf)
    assert len(dist) == 8 and dist[5] == 0.3
    with pytest.raises(ValueError, match="unsupported distortion model"):
        Intrinsics.from_matrix(K, dist)
    # zero tail (proto always serializes what it was given) still accepted
    buf5 = _pb2().Intrinsics(fx=525.0, fy=525.0, ppx=319.5, ppy=239.5,
                             coeffs=[0.1, -0.2, 0.0, 0.0, 0.05, 0.0, 0.0, 0.0]
                             ).SerializeToString()
    K5, dist5 = _unpack_intrinsics(buf5)
    intr = Intrinsics.from_matrix(K5, dist5)
    assert intr.dist == (0.1, -0.2, 0.0, 0.0, 0.05)


def test_zmq_capture_decode_error_surfaces():
    """A malformed frame payload must surface as a decode error on the
    consumer thread, not kill the capture thread and present as a
    generic timeout (code-review r3)."""
    pytest.importorskip("zmq")
    from kbslam.io.zmq_camera import FramePublisher, RGBD_TOPIC, ZMQCamera

    pub = FramePublisher("tcp://*:5713")
    cam = ZMQCamera("tcp://localhost:5713", timeout_s=10.0)
    time.sleep(0.3)
    K = np.eye(3) * 100.0
    for _ in range(50):
        pub.publish_intrinsics(K)
        try:
            cam.get_intrinsics()
            break
        except TimeoutError:
            continue
    # garbage that fails both the raw length check and the proto parse
    pub._sock.send_multipart([RGBD_TOPIC, b"\xff" * 37, b"\xff", b"\xff"])
    with pytest.raises(RuntimeError, match="capture thread failed"):
        cam.grab_frames(timeout=5.0)
    cam.close()
    pub.close()


def test_proto_image_pack_unpack_all_types():
    """Image codec: CV_8UC3 / CV_16UC1 / CV_8UC1 round-trip, and raw
    frames never mis-detect as proto (length self-validation)."""
    from kbslam.io.zmq_camera import _pack, _pack_proto, _unpack

    rng = np.random.default_rng(7)
    for arr in (rng.integers(0, 255, (33, 41, 3), dtype=np.uint8),
                rng.integers(0, 9000, (33, 41), dtype=np.uint16),
                rng.integers(0, 2, (33, 41), dtype=np.uint8)):
        np.testing.assert_array_equal(_unpack(_pack_proto(arr)), arr)
        np.testing.assert_array_equal(_unpack(_pack(arr)), arr)


def test_blueprint_spec_binds_to_reference_rbl():
    """BLUEPRINT_SPEC must cover the reference's checked-in blueprint
    (visual_odometry.rbl, loaded by Viewer.cpp:8): every entity path the
    binary references must fall under one of our view origins / logged
    paths, and every view origin we declare must exist in the binary.
    Fails if the spec drifts from the reference's viewport layout.

    Matching is mutual-prefix tolerant: the RRF2 container stores
    length-prefixed strings in compressed blocks, so a scan sees
    artifacts like 'camera/0/depth2' (glued tag byte) or
    '/camera/0/dep' (head truncated by a back-reference)."""
    import os

    from kbslam.viz.rerun_viewer import (
        BLUEPRINT_SPEC, LOGGED_PATHS, scan_blueprint_entity_paths)

    rbl = "/root/reference/visual_odometry.rbl"
    if not os.path.exists(rbl):
        pytest.skip("reference blueprint not present")
    found = scan_blueprint_entity_paths(rbl)
    assert found, "scan found no entity paths — scanner broken?"

    origins = [s["origin"] for s in BLUEPRINT_SPEC.values()]
    known = set(origins) | set(LOGGED_PATHS)

    def covered(cand):
        return any(cand.startswith(k) or k.startswith(cand) for k in known)

    uncovered = sorted(c for c in found if not covered(c))
    assert not uncovered, f"rbl paths not covered by BLUEPRINT_SPEC: {uncovered}"

    data = open(rbl, "rb").read()
    for o in origins:
        assert o.lstrip("/").encode() in data, (
            f"declared view origin {o} absent from the reference blueprint")

    # every logged path must be visible through some declared view
    for p in LOGGED_PATHS:
        assert any(p == o or p.startswith(o + "/") for o in origins), p

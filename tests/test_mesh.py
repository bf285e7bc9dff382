"""Triangle-mesh extraction (mapping/mesh.py) — capability extension on
top of the dense TSDF volume (the reference's world model is sparse
landmarks only, Map.cpp/MapPoint.hpp).

No mesh library exists in this image, so the gates are analytic:
 - a sphere SDF must mesh to a CLOSED genus-0 surface (Euler
   characteristic 2, every directed edge paired) with the right radius,
   area, and outward normals;
 - fused keyframe depth of the synthetic plane must mesh onto z = 0
   with normals facing the camera side;
 - the binary PLY writer must roundtrip.
"""
import numpy as np
import pytest

from kbslam.config import DenseMapConfig
from kbslam.mapping.dense import TSDFState
from kbslam.mapping.mesh import (TriangleMesh, load_ply,
                                 marching_tetrahedra, save_ply,
                                 vertex_normals)


def _sphere_state(cfg: DenseMapConfig, center, radius):
    """Analytic sphere TSDF: positive outside (free space), negative
    inside — the sign convention of mapping/dense.py integrate
    (sdf = measured_depth − voxel_z)."""
    nx, ny, nz = cfg.dims
    ii, jj, kk = np.meshgrid(np.arange(nx), np.arange(ny),
                             np.arange(nz), indexing="ij")
    X = np.asarray(cfg.origin) \
        + (np.stack([ii, jj, kk], -1) + 0.5) * cfg.voxel_size
    d = np.linalg.norm(X - np.asarray(center), axis=-1)
    t = np.clip((d - radius) / cfg.truncation, -1.0, 1.0)
    return TSDFState(tsdf=t.astype(np.float32),
                     weight=np.ones((nx, ny, nz), np.float32))


def _tri_areas(mesh: TriangleMesh) -> np.ndarray:
    v, f = mesh.vertices.astype(np.float64), mesh.faces
    n = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    return 0.5 * np.linalg.norm(n, axis=1)


def test_sphere_mesh_geometry_and_topology():
    cfg = DenseMapConfig(dims=(48, 48, 48), voxel_size=0.05,
                         origin=(-1.2, -1.2, -1.2), truncation=0.15)
    R, c = 0.8, (0.0, 0.0, 0.0)
    mesh = marching_tetrahedra(_sphere_state(cfg, c, R), cfg)
    assert len(mesh.faces) > 1000

    # geometry: every vertex on the sphere (analytic SDF is exact along
    # the radial direction; linear interpolation error ≪ a voxel)
    r = np.linalg.norm(mesh.vertices, axis=1)
    assert np.max(np.abs(r - R)) < 0.35 * cfg.voxel_size, \
        np.max(np.abs(r - R))

    # area within 5% of 4πR²
    area = _tri_areas(mesh).sum()
    assert abs(area - 4 * np.pi * R * R) < 0.05 * 4 * np.pi * R * R, area

    # topology: welded, closed, genus 0 — V − E + F = 2, and every
    # directed edge appears exactly once (consistent global winding)
    f = mesh.faces
    assert f.min() >= 0 and f.max() < len(mesh.vertices)
    de = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    uniq, counts = np.unique(de, axis=0, return_counts=True)
    assert counts.max() == 1, "duplicated directed edge (winding flip)"
    und = np.unique(np.sort(de, axis=1), axis=0)
    assert len(und) * 2 == len(de), "boundary edge on a closed surface"
    chi = len(mesh.vertices) - len(und) + len(f)
    assert chi == 2, chi

    # orientation: normals point outward (toward positive tsdf)
    n = vertex_normals(mesh)
    out = (n * (mesh.vertices / np.maximum(r[:, None], 1e-9))).sum(1)
    assert np.all(out > 0.7), out.min()


def test_mesh_matches_surface_points_on_fused_plane():
    """Meshing the FUSED volume (real integration path, GT poses) must
    land on the analytic plane z = 0 with camera-facing normals."""
    from kbslam.geom.camera import Intrinsics
    from kbslam.io.synthetic import render_sequence
    from kbslam.mapping.dense import integrate_sequence

    seq = render_sequence(num_frames=10, height=240, width=320)
    intr = Intrinsics.from_matrix(seq.K)
    cfg = DenseMapConfig(origin=(-4.08, -4.08, -1.36))
    st = integrate_sequence(seq.depth.astype(np.float32) * 0.001,
                            seq.poses, intr, cfg)
    mesh = marching_tetrahedra(st, cfg)
    assert len(mesh.faces) > 2000
    err = np.abs(mesh.vertices[:, 2])
    assert np.median(err) < 0.005, np.median(err)
    assert np.percentile(err, 90) < 0.02

    # normals face the free-space side the cameras observed from (−z)
    n = vertex_normals(mesh)
    assert np.mean(n[:, 2] < 0) > 0.99, np.mean(n[:, 2] < 0)

    # no degenerate faces, all indices valid
    a = _tri_areas(mesh)
    assert np.all(a > 0)


def test_empty_and_signfree_volume_mesh():
    cfg = DenseMapConfig(dims=(8, 8, 8), voxel_size=0.1,
                         origin=(0.0, 0.0, 0.0))
    from kbslam.mapping.dense import empty_tsdf

    mesh = marching_tetrahedra(empty_tsdf(cfg), cfg)
    assert len(mesh.vertices) == 0 and len(mesh.faces) == 0

    # all-observed but sign-free volume (tsdf ≡ +1) also meshes empty
    st = TSDFState(tsdf=np.ones(cfg.dims, np.float32),
                   weight=np.ones(cfg.dims, np.float32))
    mesh = marching_tetrahedra(st, cfg)
    assert len(mesh.faces) == 0


def test_ply_roundtrip(tmp_path):
    cfg = DenseMapConfig(dims=(24, 24, 24), voxel_size=0.1,
                         origin=(-1.2, -1.2, -1.2), truncation=0.3)
    mesh = marching_tetrahedra(_sphere_state(cfg, (0, 0, 0), 0.7), cfg)
    n = vertex_normals(mesh)
    p = tmp_path / "m.ply"
    save_ply(str(p), mesh, n)
    got, gn = load_ply(str(p))
    np.testing.assert_allclose(got.vertices, mesh.vertices)
    np.testing.assert_array_equal(got.faces, mesh.faces)
    np.testing.assert_allclose(gn, n)

    # normals optional
    save_ply(str(p), mesh)
    got, gn = load_ply(str(p))
    assert gn is None and len(got.vertices) == len(mesh.vertices)


def test_cli_save_mesh(tmp_path):
    import json
    import sys
    from io import StringIO

    from kbslam.cli import main

    out = tmp_path / "mesh.ply"
    argv = ["--source", "synthetic", "--frames", "16",
            "--width", "160", "--height", "120",
            "--ba", "off", "--dense", "--save-mesh", str(out)]
    cap = StringIO()
    old = sys.stdout
    sys.stdout = cap
    try:
        main(argv)
    finally:
        sys.stdout = old
    summary = json.loads(cap.getvalue().strip().splitlines()[-1])
    assert summary["mesh_vertices"] > 0
    assert summary["mesh_faces"] > 0
    mesh, n = load_ply(str(out))
    assert len(mesh.vertices) == summary["mesh_vertices"]
    assert len(mesh.faces) == summary["mesh_faces"]
    assert n is not None and n.shape == mesh.vertices.shape

    # --save-mesh without --dense is a usage error
    with pytest.raises(SystemExit):
        sys.stdout = StringIO()
        sys.stderr = StringIO()
        try:
            main(["--source", "synthetic", "--frames", "4",
                  "--save-mesh", str(out)])
        finally:
            sys.stdout, sys.stderr = old, sys.__stderr__

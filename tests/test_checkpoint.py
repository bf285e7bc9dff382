"""Checkpoint/resume: a resumed run continues bit-identically."""
import numpy as np
import jax
import jax.numpy as jnp

from kbslam.config import SLAMConfig, OrbConfig, PnPConfig, MapConfig
from kbslam.geom.camera import Intrinsics
from kbslam.io.checkpoint import load_checkpoint, save_checkpoint
from kbslam.io.synthetic import render_sequence
from kbslam.pipeline import init_state, make_track_step


def test_checkpoint_resume_bit_identical(tmp_path):
    seq = render_sequence(num_frames=12, height=240, width=320)
    cfg = SLAMConfig(
        image_height=240, image_width=320,
        orb=OrbConfig(num_features=512, num_levels=4, max_features=512),
        pnp=PnPConfig(num_hypotheses=128),
        map=MapConfig(max_keyframes=16, max_map_points=8192),
    )
    intr = Intrinsics.from_matrix(seq.K)
    step = make_track_step(cfg, intr, use_mask=False)

    state = init_state(cfg)
    for i in range(6):
        state, out = step(state, jnp.asarray(seq.rgb[i]),
                          jnp.asarray(seq.depth[i]), jax.random.PRNGKey(i))

    ckpt = str(tmp_path / "slam.ckpt.npz")
    save_checkpoint(ckpt, state)

    # continue original
    state_a = state
    outs_a = []
    for i in range(6, 12):
        state_a, out = step(state_a, jnp.asarray(seq.rgb[i]),
                            jnp.asarray(seq.depth[i]), jax.random.PRNGKey(i))
        outs_a.append(jax.device_get(out))

    # resume from disk
    state_b, _ = load_checkpoint(ckpt, cfg)
    outs_b = []
    for i in range(6, 12):
        state_b, out = step(state_b, jnp.asarray(seq.rgb[i]),
                            jnp.asarray(seq.depth[i]), jax.random.PRNGKey(i))
        outs_b.append(jax.device_get(out))

    for a, b in zip(outs_a, outs_b):
        np.testing.assert_array_equal(np.asarray(a.pose_t), np.asarray(b.pose_t))
        assert int(a.num_inliers) == int(b.num_inliers)


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    cfg = SLAMConfig(
        image_height=240, image_width=320,
        orb=OrbConfig(num_features=128, num_levels=2, max_features=128),
        map=MapConfig(max_keyframes=4, max_map_points=512),
    )
    state = init_state(cfg)
    p = str(tmp_path / "c.npz")
    save_checkpoint(p, state)
    import pytest

    other = SLAMConfig(
        image_height=240, image_width=320,
        orb=OrbConfig(num_features=128, num_levels=2, max_features=256),
        map=MapConfig(max_keyframes=4, max_map_points=512),
    )
    with pytest.raises(ValueError):
        load_checkpoint(p, other)

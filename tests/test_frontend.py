"""ORB frontend parity tests vs the OpenCV oracle (statistical, per SURVEY §7:
exact keypoint-set equality with cv2 is not the goal — overlap rates and
downstream ATE are)."""
import numpy as np
import cv2
import jax
import jax.numpy as jnp
import pytest

from kbslam.config import OrbConfig
from kbslam.frontend import brief
from kbslam.frontend.fast import fast_score_map, nms3x3, border_mask
from kbslam.frontend.image import rgb_to_gray, gaussian_blur, build_pyramid
from kbslam.frontend.orb import detect_and_compute, level_quotas


@pytest.fixture(scope="module")
def textured_image():
    """Deterministic synthetic texture with plenty of corners."""
    rng = np.random.default_rng(7)
    img = np.zeros((240, 320), np.uint8)
    # random bright rectangles create corner-rich structure
    for _ in range(120):
        x, y = rng.integers(0, 300), rng.integers(0, 220)
        w, h = rng.integers(4, 24, size=2)
        val = rng.integers(30, 255)
        img[y : y + h, x : x + w] = val
    img = cv2.GaussianBlur(img, (3, 3), 0.8)
    return img


def test_rgb_to_gray_matches_cv2():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, size=(32, 40, 3), dtype=np.uint8)
    ours = np.asarray(rgb_to_gray(jnp.asarray(rgb)))
    want = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY).astype(np.float32)
    assert np.abs(ours - want).max() <= 1.0  # cv2 rounds to uint8


def test_gaussian_blur_close_to_cv2(textured_image):
    img = textured_image.astype(np.float32)
    ours = np.asarray(gaussian_blur(jnp.asarray(img), 7, 2.0))
    want = cv2.GaussianBlur(img, (7, 7), 2.0)
    interior = (slice(8, -8), slice(8, -8))
    assert np.abs(ours[interior] - want[interior]).max() < 1.0


def test_fast_detects_cv2_corners(textured_image):
    img = textured_image.astype(np.float32)
    score = np.asarray(fast_score_map(jnp.asarray(img), 20.0))

    det = cv2.FastFeatureDetector_create(
        threshold=20, nonmaxSuppression=False,
        type=cv2.FastFeatureDetector_TYPE_9_16)
    kps = det.detect(textured_image)
    cv_pts = {(int(k.pt[0]), int(k.pt[1])) for k in kps}
    interior = {(x, y) for (x, y) in cv_pts if 5 <= x < 315 and 5 <= y < 235}
    assert len(interior) > 50

    ours = {(x, y) for y, x in zip(*np.nonzero(score > 0))}
    hit = len(interior & ours) / len(interior)
    # statistical parity: our arc test should agree with cv2 on >=95%
    assert hit >= 0.95, f"FAST overlap only {hit:.2%}"
    # and not fire wildly more often
    ours_interior = {(x, y) for (x, y) in ours if 5 <= x < 315 and 5 <= y < 235}
    assert len(ours_interior) <= len(interior) * 1.3


def test_nms_keeps_local_maxima():
    score = jnp.zeros((16, 16)).at[5, 5].set(10.0).at[5, 6].set(8.0).at[10, 10].set(3.0)
    out = np.asarray(nms3x3(score))
    assert out[5, 5] == 10.0 and out[5, 6] == 0.0 and out[10, 10] == 3.0


def test_border_mask():
    m = np.asarray(border_mask(100, 80, 31))
    assert not m[30, 40] and m[31, 40] and not m[40, 79 - 30]


def test_pack_unpack_bits_roundtrip():
    rng = np.random.default_rng(1)
    d = jnp.asarray(rng.integers(0, 2, size=(8, 256), dtype=np.uint8))
    packed = brief.pack_bits(d)
    assert packed.shape == (8, 32)
    np.testing.assert_array_equal(np.asarray(brief.unpack_bits(packed)), np.asarray(d))


def test_level_quotas_sum():
    cfg = OrbConfig()
    q = level_quotas(cfg)
    # quotas distribute the cv::ORB detection budget (num_features =
    # 3000, the reference parity knob); detect_and_compute pads up to
    # max_features (static capacity) with invalid lanes
    assert sum(q) == min(cfg.num_features, cfg.max_features)
    assert all(a > 0 for a in q)
    assert q[0] > q[-1]  # geometric decay


def test_detect_and_compute_shapes(textured_image):
    cfg = OrbConfig(num_levels=3, max_features=256)
    gray = jnp.asarray(textured_image, jnp.float32)
    feats = jax.jit(lambda g: detect_and_compute(g, None, cfg))(gray)
    F = cfg.max_features
    assert feats.xy.shape == (F, 2)
    assert feats.desc.shape == (F, 256)
    n = int(feats.count())
    assert n > 50
    # valid keypoints stay inside the border at their level
    v = np.asarray(feats.valid)
    xy = np.asarray(feats.xy)[v]
    assert xy.min() >= 0 and (xy[:, 0] < 320).all() and (xy[:, 1] < 240).all()


def test_descriptors_rotation_invariant(textured_image):
    """Descriptor of a rotated image should match the original's (rBRIEF)."""
    cfg = OrbConfig(num_levels=1, max_features=128)
    gray = jnp.asarray(textured_image, jnp.float32)
    feats = detect_and_compute(gray, None, cfg)

    rot = cv2.rotate(textured_image, cv2.ROTATE_90_CLOCKWISE)
    feats_r = detect_and_compute(jnp.asarray(rot, jnp.float32), None, cfg)

    # Match original descriptors against rotated set: for each valid original
    # keypoint, its rotated position is (W-1-y, x) for 90 deg CW.
    v = np.asarray(feats.valid)
    xy = np.asarray(feats.xy)[v]
    d0 = np.asarray(feats.desc)[v]
    vr = np.asarray(feats_r.valid)
    xyr = np.asarray(feats_r.xy)[vr]
    dr = np.asarray(feats_r.desc)[vr]

    h = textured_image.shape[0]
    expected = np.stack([h - 1 - xy[:, 1], xy[:, 0]], axis=-1)
    # pair up keypoints detected in both
    good = 0
    total = 0
    for i in range(len(xy)):
        dist = np.abs(xyr - expected[i]).sum(axis=1)
        j = np.argmin(dist)
        if dist[j] <= 2.0:
            total += 1
            ham = np.sum(d0[i] != dr[j])
            if ham <= 64:  # 25% of bits
                good += 1
    assert total >= 10
    assert good / total >= 0.8, f"rotation invariance only {good}/{total}"


def test_mask_suppresses_detections(textured_image):
    cfg = OrbConfig(num_levels=2, max_features=256)
    gray = jnp.asarray(textured_image, jnp.float32)
    mask = np.ones_like(textured_image)
    mask[:, :160] = 0  # kill left half
    feats = detect_and_compute(gray, jnp.asarray(mask), cfg)
    v = np.asarray(feats.valid)
    xy = np.asarray(feats.xy)[v]
    assert (xy[:, 0] >= 155).all()  # small slack for level-1 nearest resize


def test_subpixel_packed_offsets_match_direct_lookups(textured_image):
    """The packed dense-offset encoding (one f32 lane carrying both axis
    offsets, one gather per corner — see orb.detect_and_compute) must
    decode to the direct 5-lookup parabolic refinement, up to the 1/1024
    px quantization of the packing."""
    from kbslam.frontend.harris import harris_response
    from kbslam.frontend.image import shift2d
    from kbslam.frontend.orb import _parabolic_offset

    cfg = OrbConfig(num_levels=1, max_features=128)
    gray = jnp.asarray(textured_image, jnp.float32)
    harris = harris_response(gray, cfg.harris_block_size, cfg.harris_k)

    # the production encoding (same expressions as orb.detect_and_compute)
    dxm = _parabolic_offset(shift2d(harris, 0, -1), harris,
                            shift2d(harris, 0, 1))
    dym = _parabolic_offset(shift2d(harris, -1, 0), harris,
                            shift2d(harris, 1, 0))
    enc = (jnp.round((dxm + 0.5) * 1024.0) * 2048.0
           + jnp.round((dym + 0.5) * 1024.0))

    rng = np.random.default_rng(3)
    h, w = harris.shape
    yi = rng.integers(2, h - 2, size=300)
    xi = rng.integers(2, w - 2, size=300)
    e = np.asarray(enc)[yi, xi]
    dx_dec = np.floor(e / 2048.0) / 1024.0 - 0.5
    dy_dec = np.mod(e, 2048.0) / 1024.0 - 0.5

    hn = np.asarray(harris)
    c0 = hn[yi, xi]
    dx_ref = np.asarray(_parabolic_offset(
        jnp.asarray(hn[yi, xi - 1]), jnp.asarray(c0),
        jnp.asarray(hn[yi, xi + 1])))
    dy_ref = np.asarray(_parabolic_offset(
        jnp.asarray(hn[yi - 1, xi]), jnp.asarray(c0),
        jnp.asarray(hn[yi + 1, xi])))
    # saturated offsets decode exactly; interior ones to quantization
    np.testing.assert_allclose(dx_dec, dx_ref, atol=1.01 / 1024)
    np.testing.assert_allclose(dy_dec, dy_ref, atol=1.01 / 1024)
    assert (np.abs(dx_dec) <= 0.5 + 1e-6).all()
    assert (np.abs(dy_dec) <= 0.5 + 1e-6).all()

"""Rotated BRIEF (rBRIEF) 256-bit descriptors.

Functional equivalent of cv::ORB's steered-BRIEF stage: 256 pixel-pair
comparisons in a 31x31 patch, with the sampling pattern rotated by the
keypoint's IC angle. The reference relies on OpenCV's learned
bit_pattern_31; we use a deterministic Gaussian pattern (seed fixed,
sigma = patch/5, offsets clipped to +-13) — the classic BRIEF
construction — which has equivalent matching behavior while keeping the
code free of copied tables. Bits are stored unpacked ([N, 256] uint8 in
{0,1}) so the matcher can feed them straight to the MXU as int8.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

DESc_BITS = 256
PATTERN_CLIP = 13  # keeps rotated samples within the 31-px edge margin


@functools.lru_cache(maxsize=1)
def brief_pattern() -> np.ndarray:
    """[256, 4] int32 (x1, y1, x2, y2) sampling offsets.

    Prefers the learned decorrelated pattern (ORB-paper greedy
    selection over corner patches: bit means near 0.5, pairwise
    correlations bounded — see tools/learn_brief_pattern.py); falls
    back to a deterministic Gaussian pattern.
    """
    import os

    learned = os.path.join(os.path.dirname(__file__),
                           "brief_pattern_learned.npy")
    if os.path.exists(learned):
        pat = np.load(learned).astype(np.int32)
        if pat.shape == (DESc_BITS, 4):
            return np.clip(pat, -PATTERN_CLIP, PATTERN_CLIP)
    rng = np.random.default_rng(42)
    sigma = 31.0 / 5.0
    pts = rng.normal(0.0, sigma, size=(DESc_BITS, 4))
    return np.clip(np.round(pts), -PATTERN_CLIP, PATTERN_CLIP).astype(np.int32)


_PATCH_R = 20          # covers the rotated pattern: 13*sqrt(2) + rounding
_PATCH_S = 2 * _PATCH_R
N_ANGLE_BINS = 30      # cv::ORB quantizes orientation to 30 steps of 12 deg


@functools.lru_cache(maxsize=1)
def _rotated_selection_matrices() -> np.ndarray:
    """[30, 256, S^2] int8 — per angle bin, the (onehot(p2) - onehot(p1))
    rows that evaluate every descriptor bit as a dot with the flattened
    40x40 patch. Precomputed host-side; embedded as a program constant.
    Matches cv::ORB's precomputed per-bin rotated patterns."""
    pat = brief_pattern().astype(np.float64)
    p1 = pat[:, :2]
    p2 = pat[:, 2:]
    S = _PATCH_S
    out = np.zeros((N_ANGLE_BINS, 256, S * S), np.int8)
    for b in range(N_ANGLE_BINS):
        th = 2.0 * np.pi * b / N_ANGLE_BINS
        c, s = np.cos(th), np.sin(th)
        R = np.array([[c, -s], [s, c]])
        for (pts, sign) in ((p1, -1), (p2, +1)):
            q = np.rint(pts @ R.T).astype(np.int64)
            idx = (q[:, 1] + _PATCH_R) * S + (q[:, 0] + _PATCH_R)
            out[b, np.arange(256), idx] += sign
    return out


@functools.lru_cache(maxsize=1)
def _used_selection_matrices():
    """(W_used [30*256, U] int8, used_cols [U] int32): the selection
    matrices restricted to the union of columns any bin references."""
    W = _rotated_selection_matrices().reshape(
        N_ANGLE_BINS * 256, _PATCH_S * _PATCH_S)
    used = np.flatnonzero(np.any(W != 0, axis=0)).astype(np.int32)
    return np.ascontiguousarray(W[:, used]), used


@functools.lru_cache(maxsize=4)
def _ic_moment_vectors(radius: int = 15) -> np.ndarray:
    """[S^2, 2] float32 — x- and y-weighted circular-disc weights over the
    flattened 40x40 patch, for intensity-centroid orientation."""
    S = _PATCH_S
    ys, xs = np.mgrid[0:S, 0:S]
    dx = xs - _PATCH_R
    dy = ys - _PATCH_R
    disc = (dx * dx + dy * dy) <= radius * radius
    return np.stack(
        [(dx * disc).reshape(-1), (dy * disc).reshape(-1)], axis=-1
    ).astype(np.float32)


def extract_patches(
    stacked: jnp.ndarray,        # [L, H0, W0] padded pyramid levels
    level_dims: jnp.ndarray,     # [L, 2] (h_l, w_l)
    xy: jnp.ndarray,             # [N, 2] LEVEL-coordinate keypoints
    level: jnp.ndarray,          # [N] int32
    precision: str = "highest",  # Pallas selection-dot precision
) -> jnp.ndarray:
    """One 40x40 patch per keypoint, [N, S^2].

    On TPU this runs the Pallas block-fetch kernel
    (kbslam/ops/pallas_patches.py, ~2.5 ms for 3000 patches); elsewhere
    it falls back to a vmapped dynamic_slice (~2 us/slice on TPU —
    slice-COUNT bound, not byte bound)."""
    n = xy.shape[0]
    base = jnp.round(xy).astype(jnp.int32)
    hw = level_dims[level]
    # upper clamp floored at 0: when a pyramid level is SMALLER than the
    # patch (tiny frames, deep levels), hw - S is negative and
    # jnp.clip(x, 0, neg) returns neg — a negative patch origin drives
    # negative Pallas block indices (out-of-bounds DMA on TPU). Such
    # levels produce no valid keypoints (the 31-px border mask empties
    # them), so origin 0 is a safe don't-care.
    x0 = jnp.clip(base[:, 0] - _PATCH_R, 0,
                  jnp.maximum(hw[:, 1] - _PATCH_S, 0))
    y0 = jnp.clip(base[:, 1] - _PATCH_R, 0,
                  jnp.maximum(hw[:, 0] - _PATCH_S, 0))
    # materialize the stacked pyramid: otherwise XLA fuses the pyramid/blur
    # producers into the 3000 slices and recomputes them per patch
    stacked = jax.lax.optimization_barrier(stacked)

    if jax.default_backend() not in ("cpu",):
        from kbslam.ops.pallas_patches import extract_patches_pallas

        L, H, W = stacked.shape
        # the kernel assumes >= 2 blocks per dim (its 2x2 block window);
        # pad up to at least 2 blocks so tiny images stay in bounds
        Hp = max(-(-H // 48) * 48, 2 * 48)
        Wp = max(-(-W // 128) * 128, 2 * 128)
        if (Hp, Wp) != (H, W):
            stacked = jnp.pad(stacked, ((0, 0), (0, Hp - H), (0, Wp - W)))
        try:
            prec = {"highest": jax.lax.Precision.HIGHEST,
                    "default": jax.lax.Precision.DEFAULT,
                    "split3": "split3"}[precision]
        except KeyError:
            raise ValueError(
                f"patch_precision {precision!r}: expected 'default' "
                "(1 bf16 pass, production), 'split3' (3 passes, "
                "bit-exact f32), or 'highest' (~6 passes)") from None
        return extract_patches_pallas(stacked, level, y0, x0,
                                      precision=prec).reshape(
            n, _PATCH_S * _PATCH_S)

    return jax.vmap(
        lambda lv, xx, yy: jax.lax.dynamic_slice(
            stacked, (lv, yy, xx), (1, _PATCH_S, _PATCH_S))[0]
    )(level, x0, y0).reshape(n, _PATCH_S * _PATCH_S)


def ic_angles(patches: jnp.ndarray, radius: int = 15) -> jnp.ndarray:
    """Intensity-centroid orientation from patches: theta = atan2(m01, m10).

    Replaces the dense per-level 31x31 moment convolutions — a
    single-input-channel conv is catastrophically slow on the MXU
    (measured ~60 ms/frame); this is one [N, S^2] x [S^2, 2] matvec.
    The centroid of a symmetrically-blurred patch equals the centroid of
    the raw patch to first order, so sharing the blurred patches with
    BRIEF is sound.
    """
    mv = jnp.asarray(_ic_moment_vectors(radius))
    m = patches @ mv                                  # [N, 2] = (m10, m01)
    return jnp.arctan2(m[:, 1], m[:, 0])


def bits_from_patches(patches: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """rBRIEF bits from per-keypoint patches.

    Orientation is quantized to 30 bins (cv::ORB's 12-degree steps);
    the 30 rotated patterns are CONSTANT +-1 selection matrices, so all
    bins evaluate as ONE dense [N, S^2] x [S^2, 30*256] matmul on the
    MXU, and each keypoint picks its bin with a one-hot contraction —
    no gathers, no per-keypoint one-hot materialization.
    """
    n = patches.shape[0]
    W_used, used_cols = _used_selection_matrices()
    # contraction restricted to the ~1180 of 1600 patch columns inside
    # the pattern's radius-19 disc (the only ones any rotated bin ever
    # samples): static column gather, 26% less MXU work on the largest
    # matmul of the tracking step
    p_used = patches[:, jnp.asarray(used_cols)]
    # bf16 operands (values <= 255: ~0.2% rounding) with f32
    # accumulation — the MXU fast path. CPU's dot thunk rejects bf16 at
    # this shape, so there the operands are rounded THROUGH bf16 and the
    # dot runs in f32: identical operand quantization + f32 accumulate,
    # i.e. the same bits as the TPU path.
    pq = p_used.astype(jnp.bfloat16)
    Wq = jnp.asarray(W_used).astype(jnp.bfloat16)
    if jax.default_backend() == "cpu":
        pq = pq.astype(jnp.float32)
        Wq = Wq.astype(jnp.float32)
    diff_all = jax.lax.dot_general(
        pq, Wq,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(n, N_ANGLE_BINS, 256)                   # I2 - I1 per bin

    two_pi = 2.0 * jnp.pi
    frac = jnp.mod(angle, two_pi) / two_pi * N_ANGLE_BINS
    bins = jnp.mod(jnp.round(frac).astype(jnp.int32), N_ANGLE_BINS)  # [N]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (n, N_ANGLE_BINS), 1)
              == bins[:, None]).astype(jnp.float32)
    diff = jnp.einsum("nbk,nb->nk", diff_all, onehot)
    return (diff > 0).astype(jnp.uint8)


def describe_stacked(
    stacked_blur: jnp.ndarray,
    level_dims: jnp.ndarray,
    xy: jnp.ndarray,
    level: jnp.ndarray,
    angle: jnp.ndarray,
) -> jnp.ndarray:
    """Convenience: patches + bits in one call (see bits_from_patches)."""
    patches = extract_patches(stacked_blur, level_dims, xy, level)
    return bits_from_patches(patches, angle)


def pack_bits(desc: jnp.ndarray) -> jnp.ndarray:
    """[N, 256] {0,1} -> [N, 32] uint8 packed (LSB-first per byte)."""
    n = desc.shape[0]
    d = desc.reshape(n, 32, 8)
    weights = (1 << jnp.arange(8, dtype=jnp.uint32)).astype(jnp.uint32)
    return jnp.sum(d.astype(jnp.uint32) * weights, axis=-1).astype(jnp.uint8)


def unpack_bits(packed: jnp.ndarray) -> jnp.ndarray:
    """[N, 32] uint8 -> [N, 256] {0,1} uint8."""
    n = packed.shape[0]
    bits = (packed[:, :, None].astype(jnp.uint32) >> jnp.arange(8, dtype=jnp.uint32)) & 1
    return bits.reshape(n, 256).astype(jnp.uint8)

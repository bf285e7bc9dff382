"""ORB feature extraction: the full grayscale -> keypoints+descriptors stage.

TPU-native re-design of cv::ORB::detectAndCompute as called by the
reference frontend (VisualOdometry.cpp:10-16,21-33 — 3000 features,
scale 1.2, 8 levels, edge 31, Harris ranking, FAST threshold 20, with a
static-element mask). The whole stage is one traced XLA program with
static shapes: per-level dense FAST + NMS + Harris maps, top-K
selection into a fixed per-level quota, dense IC-moment orientation,
and rBRIEF descriptors — padded to ``max_features`` with a validity
mask instead of dynamically-sized keypoint vectors.
"""
from __future__ import annotations

import math
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp

from kbslam.config import OrbConfig
from kbslam.frontend import brief
from kbslam.frontend.fast import border_mask, fast_score_map, nms3x3
from kbslam.frontend.harris import harris_response
from kbslam.frontend.image import (
    build_pyramid, gaussian_blur, pyramid_sizes, rgb_to_gray, shift2d)

_NEG = -1e30


def _parabolic_offset(sm, s0, sp):
    """Vertex of the parabola through (-1, sm), (0, s0), (1, sp) in [-.5, .5]."""
    denom = sm - 2.0 * s0 + sp
    off = 0.5 * (sm - sp) / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    return jnp.clip(off, -0.5, 0.5)


class Features(NamedTuple):
    """Padded keypoint set for one image (capacity = config.orb.max_features)."""

    xy: jnp.ndarray        # [F, 2] float32, level-0 pixel coords (x, y)
    response: jnp.ndarray  # [F] float32 Harris response
    angle: jnp.ndarray     # [F] float32 radians
    level: jnp.ndarray     # [F] int32 pyramid level
    valid: jnp.ndarray     # [F] bool
    desc: jnp.ndarray      # [F, 256] uint8 bits in {0, 1}

    @property
    def capacity(self) -> int:
        return self.xy.shape[-2]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)


def level_quotas(cfg: OrbConfig) -> List[int]:
    """Distribute the DETECTION budget across levels like cv::ORB:
    geometric decay with ratio 1/scale, remainder to the last level.
    The budget is cfg.num_features (the cv::ORB::create(3000, ...)
    parity knob); quotas sum to min(num_features, max_features), and
    detect_and_compute pads the concatenation with invalid lanes up to
    cfg.max_features so downstream shapes stay static/MXU-aligned."""
    factor = 1.0 / cfg.scale_factor
    n = min(cfg.num_features, cfg.max_features)
    ndesired = n * (1 - factor) / (1 - factor ** cfg.num_levels)
    quotas = []
    for lv in range(cfg.num_levels - 1):
        quotas.append(int(round(ndesired * factor ** lv)))
    quotas.append(n - sum(quotas))
    return quotas


def detect_and_compute(
    gray: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    cfg: OrbConfig,
) -> Features:
    """[H, W] float32 grayscale (+ optional nonzero=keep mask) -> Features."""
    h, w = gray.shape
    sizes = pyramid_sizes(h, w, cfg.num_levels, cfg.scale_factor)
    quotas = level_quotas(cfg)
    pyr = build_pyramid(gray, cfg.num_levels, cfg.scale_factor)

    h0, w0 = sizes[0]
    # NOTE(perf, measured): a stacked [L, h0, w0] form of the dense
    # stages (pad every level to level-0 size, one kernel set for all
    # levels) was tried and is SLOWER than this per-level loop
    # (dense 0.514 vs 0.471 ms, blur 0.333 vs 0.284 ms, same congestion
    # window — benchmarks/profile_detect.py): XLA already fuses each
    # level's stencils well, and padding triples the dense pixel work.
    # Selection is approx_max_k at 0.354 ms TOTAL vs 3.305 ms for exact
    # top_k. Don't re-stack.
    xy_parts, val_parts, lvl_parts, resp_parts = [], [], [], []
    stacked_blur = jnp.zeros((cfg.num_levels, h0, w0), jnp.float32)
    for lv in range(cfg.num_levels):
        img = pyr[lv]
        hl, wl = sizes[lv]
        score = nms3x3(fast_score_map(img, float(cfg.fast_threshold)))
        region = border_mask(hl, wl, cfg.edge_threshold)
        if mask is not None:
            mask_l = jax.image.resize(
                mask.astype(jnp.float32), (hl, wl), method="nearest"
            ) > 0
            region = region & mask_l
        harris = harris_response(img, cfg.harris_block_size, cfg.harris_k)
        cand = jnp.where((score > 0) & region, harris, _NEG)

        k = quotas[lv]
        # subpixel: 1-D parabola fits on the Harris response around the
        # integer maximum (the C++ reference keeps integer corners; this
        # halves localization noise and directly improves ATE). Computed
        # as DENSE offset maps with both axes packed into one lane so
        # each selected corner costs ONE scalar gather instead of five
        # (gathers are ~45 ns/element serial on TPU; 5 lookups x 3072
        # corners measured 0.44 ms, the dense maps ~0.1 ms). Offsets are
        # quantized to 1/1024 px — far below corner noise.
        dxm = _parabolic_offset(shift2d(harris, 0, -1), harris,
                                shift2d(harris, 0, 1))
        dym = _parabolic_offset(shift2d(harris, -1, 0), harris,
                                shift2d(harris, 1, 0))
        enc = (jnp.round((dxm + 0.5) * 1024.0) * 2048.0
               + jnp.round((dym + 0.5) * 1024.0))
        # barrier: keep the dense FAST/Harris producers out of top_k's
        # sort comparator (XLA fusion recompute blowup on TPU)
        enc_b = jax.lax.optimization_barrier(enc)
        # approx_max_k: TPU-native partial-reduction top-k (measured 4x
        # faster than exact lax.top_k on the 300k-candidate level-0 map;
        # recall 0.95 only perturbs the WEAKEST corners of a level, and
        # exact selection falls out on CPU where it lowers to top_k)
        vals, idx = jax.lax.approx_max_k(
            jax.lax.optimization_barrier(cand.reshape(-1)), k,
            recall_target=0.95)
        valid = vals > _NEG * 0.5
        xi = idx % wl
        yi = idx // wl
        e = enc_b[yi, xi]
        dx_off = jnp.floor(e / 2048.0) * (1.0 / 1024.0) - 0.5
        dy_off = jnp.mod(e, 2048.0) * (1.0 / 1024.0) - 0.5
        x = xi.astype(jnp.float32) + dx_off
        y = yi.astype(jnp.float32) + dy_off
        xy_l = jnp.stack([x, y], axis=-1)

        stacked_blur = stacked_blur.at[lv, :hl, :wl].set(
            gaussian_blur(img, cfg.blur_kernel, cfg.blur_sigma))
        xy_parts.append(xy_l)
        val_parts.append(valid)
        resp_parts.append(vals)
        lvl_parts.append(jnp.full((k,), lv, jnp.int32))

    xy_lvl = jnp.concatenate(xy_parts, axis=0)       # level coords
    levels = jnp.concatenate(lvl_parts, axis=0)
    valid = jnp.concatenate(val_parts, axis=0)
    resp = jnp.concatenate(resp_parts, axis=0)

    # pad the num_features detection budget up to the max_features
    # static capacity with invalid lanes (quotas sum to num_features;
    # see level_quotas)
    pad = cfg.max_features - xy_lvl.shape[0]
    if pad > 0:
        xy_lvl = jnp.pad(xy_lvl, ((0, pad), (0, 0)))
        levels = jnp.pad(levels, (0, pad))
        valid = jnp.pad(valid, (0, pad))
        resp = jnp.pad(resp, (0, pad), constant_values=_NEG)

    # block-locality sort: order keypoints by (level, 48-row block,
    # 128-col block) so the Pallas patch kernel's consecutive grid steps
    # hit the SAME HBM blocks and its pipeline skips the re-fetch (the
    # per-step DMA dominated the kernel). Downstream consumers are
    # order-agnostic, so the permuted order simply becomes THE feature
    # order. The permutation moves via one exact one-hot matmul, not
    # per-row gathers.
    from kbslam.ops.incidence import incidence_gather

    xi = jnp.clip(jnp.round(xy_lvl[:, 0]).astype(jnp.int32), 0, w0 - 1)
    yi = jnp.clip(jnp.round(xy_lvl[:, 1]).astype(jnp.int32), 0, h0 - 1)
    sort_key = (levels * 32 + yi // 48) * 32 + xi // 128
    order = jnp.argsort(sort_key, stable=True)
    tab = jnp.concatenate(
        [xy_lvl, resp[:, None], valid[:, None].astype(jnp.float32),
         levels[:, None].astype(jnp.float32)], axis=1)
    tab_p = incidence_gather(order, tab)             # [F, 5], exact f32
    xy_lvl = tab_p[:, :2]
    resp = tab_p[:, 2]
    valid = tab_p[:, 3] > 0.5
    levels = tab_p[:, 4].astype(jnp.int32)

    # single batched patch pass across all levels: IC orientation and
    # rBRIEF bits both come from the same 40x40 patches (no dense
    # moment convolutions — see brief.ic_angles)
    level_dims = jnp.asarray(sizes, jnp.int32)       # [L, 2] (h, w)
    patches = brief.extract_patches(stacked_blur, level_dims, xy_lvl, levels,
                                    precision=cfg.patch_precision)
    angle = brief.ic_angles(patches, radius=cfg.patch_size // 2)
    desc = brief.bits_from_patches(patches, angle)

    scales = jnp.asarray(
        [cfg.scale_factor ** lv for lv in range(cfg.num_levels)],
        jnp.float32)[levels]
    return Features(
        xy=xy_lvl * scales[:, None],
        response=resp,
        angle=angle,
        level=levels,
        valid=valid,
        desc=desc,
    )


def extract(img: jnp.ndarray, mask: Optional[jnp.ndarray], cfg: OrbConfig) -> Features:
    """RGB uint8 [H, W, 3] — or pre-converted grayscale [H, W] — ->
    Features (the reference's ExtractFeatures). Gray input exists for
    bandwidth-bound ingress links: host-side luma conversion cuts the
    upload 1.6x and the extractor never needed color."""
    gray = rgb_to_gray(img) if img.ndim == 3 else img.astype(jnp.float32)
    return detect_and_compute(gray, mask, cfg)

"""Chunked streaming executor — the host->device ingress pipeline.

The reference hides camera latency with a capture thread + latest-wins
mailbox (Camera.cpp:26-106). The TPU-native equivalent has to hide TWO
costs: the host->device upload AND the per-dispatch round-trip (on a
tunneled runtime each dispatch costs ~25 ms wall regardless of device
time; even locally-attached chips pay ~0.2 ms). Per-frame dispatch can
therefore never reach device throughput; the fix is micro-batching:

  - frames are grouped into chunks of C and tracked by ONE dispatch
    (lax.scan over the stacked chunk — same compiled program the
    device-resident benchmark uses),
  - chunk k+1 is stacked and device_put (async) while chunk k computes,
  - chunk k-1's outputs are fetched while chunk k computes, so the
    host<->device transfers in both directions overlap device work.

Per-frame poses and diagnostics come out exactly as the per-frame path
produces them (same track_step, same PRNG fold_in on frame_count);
results just arrive with up to C frames of latency — the same contract
as the reference's detached BA thread, which also reads the map a few
frames late. Latency/throughput trade: C=1 is the reference behavior,
C=8 amortizes the dispatch round-trip 8x.
"""
from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kbslam.config import SLAMConfig
from kbslam.geom.camera import Intrinsics
from kbslam.pipeline import TrackState, track_step


@functools.lru_cache(maxsize=8)
def make_chunk_step(cfg: SLAMConfig, intr: Intrinsics, chunk: int,
                    use_mask: bool = False, seed: int = 0):
    """jit: (state, rgb[C,H,W,3], dep[C,H,W], mask?[C,H,W]) ->
    (state, TrackOutput batched over C). One dispatch per C frames."""

    def scan_body(st, xs):
        if use_mask:
            rgb, dep, msk, real = xs
        else:
            rgb, dep, real = xs
            msk = None
        key = jax.random.fold_in(jax.random.PRNGKey(seed), st.frame_count)
        st2, out = track_step(st, rgb, dep, msk, key, intr, cfg)
        # padding frames (real=False, final partial chunk only) must not
        # touch the map/pose/PRNG stream: select the old state through
        st = jax.tree.map(lambda a, b: jnp.where(real, a, b), st2, st)
        out = out._replace(success=out.success & real,
                           added_kf=out.added_kf & real)
        return st, out

    def run(state, rgb, dep, mask, real):
        xs = (rgb, dep, mask, real) if use_mask else (rgb, dep, real)
        return jax.lax.scan(scan_body, state, xs)

    return jax.jit(run, donate_argnums=(0,))


class ChunkedStream:
    """Double-buffered chunked tracking over a host frame stream.

    feed() accepts one frame; every C-th frame triggers one device
    dispatch. Outputs arrive via drain() with <= 2C frames of latency;
    flush() pads the final partial chunk (masked by count) and drains
    everything. Keyframe-triggered work (local BA) runs chunk-late,
    mirroring the reference's detached-BA-thread timing.
    """

    def __init__(self, cfg: SLAMConfig, intr: Intrinsics, state: TrackState,
                 chunk: int = 8, use_mask: bool = False, seed: int = 0,
                 gray: bool = False):
        """gray=True converts RGB to uint8 luma on the HOST before
        upload — 1.6x fewer ingress bytes on bandwidth-bound links (the
        extractor is grayscale-only anyway; quantization differs from
        the device float path by <=0.5 gray levels)."""
        self.chunk = int(chunk)
        self.use_mask = use_mask
        self.gray = gray
        self._step = make_chunk_step(cfg, intr, self.chunk, use_mask, seed)
        self.state = state
        self._host: List[tuple] = []
        self._inflight = []   # [(n_real, batched TrackOutput futures)]
        self._drained: List[dict] = []
        self._frame = 0

    def _dispatch(self, n_real: int):
        rgb = jax.device_put(np.stack([f[0] for f in self._host]))
        dep = jax.device_put(np.stack([f[1] for f in self._host]))
        mask = (jax.device_put(np.stack([f[2] for f in self._host]))
                if self.use_mask else None)
        real = np.arange(self.chunk) < n_real
        self._host = []
        self.state, outs = self._step(self.state, rgb, dep, mask,
                                      jax.device_put(real))
        self._inflight.append((n_real, outs))

    def _collect(self, n_real, outs):
        o = jax.device_get(outs)  # hard barrier: bytes on host
        for i in range(n_real):
            self._drained.append(dict(
                frame=self._frame,
                success=bool(o.success[i]),
                added_kf=bool(o.added_kf[i]),
                pose_q=np.asarray(o.pose_q[i]),
                pose_t=np.asarray(o.pose_t[i]),
                inlier_ratio=float(o.inlier_ratio[i]),
                num_matches=int(o.num_matches[i]),
                num_inliers=int(o.num_inliers[i]),
                num_features=int(o.num_features[i]),
            ))
            self._frame += 1

    def feed(self, rgb, depth, mask=None) -> List[dict]:
        """Add one frame; returns any newly drained per-frame results."""
        if self.gray and rgb.ndim == 3:
            from kbslam.frontend.image import GRAY_WEIGHTS
            # round (not truncate): keeps the u8 quantization within the
            # documented 0.5 gray levels of the device float path
            rgb = np.round(
                np.asarray(rgb, np.float32)
                @ np.array(GRAY_WEIGHTS, np.float32)
            ).astype(np.uint8)
        self._host.append((rgb, depth, mask) if self.use_mask
                          else (rgb, depth))
        if len(self._host) == self.chunk:
            self._dispatch(self.chunk)
        out: List[dict] = []
        # keep ONE chunk in flight: drain older results while the newest
        # chunk computes (downward transfer overlaps device work)
        while len(self._inflight) > 1:
            self._collect(*self._inflight.pop(0))
        if self._drained:
            out, self._drained = self._drained, []
        return out

    def flush(self) -> List[dict]:
        """Pad + dispatch the partial chunk, drain every result."""
        if self._host:
            n_real = len(self._host)
            while len(self._host) < self.chunk:
                self._host.append(self._host[-1])
            self._dispatch(n_real)
        while self._inflight:
            self._collect(*self._inflight.pop(0))
        out, self._drained = self._drained, []
        return out

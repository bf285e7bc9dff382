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

Concurrent local BA (``ba_mode="async"``) mirrors the reference's
detached background BA thread (main.cpp:40-47): when a drained chunk
reports a keyframe insertion, a no-donate solve is dispatched on a
SNAPSHOT of the live map and runs concurrently with the next chunks'
tracking (JAX async dispatch = the thread overlap); the result merges
into the live map once ready, via the same race-free snapshot/merge
machinery the per-frame async path uses (ba/merge.py). BA therefore
runs chunk-late — the reference's BA also reads the map a few frames
after the insertion that triggered it.
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


def unpack_mask_bits(packed: jnp.ndarray, width: int) -> jnp.ndarray:
    """[..., W/8] uint8 (np.packbits big-endian) -> [..., W] uint8 in
    {0,1}. Device-side unpack for the 1-bit-per-pixel mask ingress: a
    640x480 mask is 38.4 KB on the wire instead of 307 KB, preserving
    the gray-ingress link win (the tunnel link is 20-60 MB/s)."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*packed.shape[:-1], packed.shape[-1] * 8)[..., :width]


@functools.lru_cache(maxsize=8)
def make_chunk_step(cfg: SLAMConfig, intr: Intrinsics, chunk: int,
                    use_mask: bool = False, seed: int = 0,
                    packed_mask: bool = False):
    """jit: (state, rgb[C,H,W,3], dep[C,H,W], mask?[C,H,W]) ->
    (state, TrackOutput batched over C). One dispatch per C frames."""

    def scan_body(st, xs):
        if use_mask:
            rgb, dep, msk, real = xs
            if packed_mask:
                msk = unpack_mask_bits(msk, cfg.image_width)
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
    everything. Keyframe-triggered work (local BA with
    ``ba_mode="async"``, culling with ``cfg.cull.enabled``, loop
    closure with ``cfg.loop.enabled``) runs chunk-late, mirroring the
    reference's detached-BA-thread timing.
    """

    def __init__(self, cfg: SLAMConfig, intr: Intrinsics, state: TrackState,
                 chunk: int = 8, use_mask: bool = False, seed: int = 0,
                 gray: bool = False, ba_mode: str = "off"):
        """gray=True converts RGB to uint8 luma on the HOST before
        upload — 1.6x fewer ingress bytes on bandwidth-bound links (the
        extractor is grayscale-only anyway; quantization differs from
        the device float path by <=0.5 gray levels). With gray the mask
        also travels bit-packed (1 bpp, unpacked on device).

        ba_mode="async" runs the reference's concurrent local BA
        (main.cpp:40-47): snapshot solve overlapped with tracking, at
        most one in flight, merged when ready."""
        assert ba_mode in ("off", "async")
        self.chunk = int(chunk)
        self.use_mask = use_mask
        self.gray = gray
        # bit-packed masks ride with gray ingress (both exist to cut
        # wire bytes); RGB ingress keeps the plain u8 mask for the exact
        # per-frame-path equivalence contract
        self._packed_mask = bool(use_mask and gray)
        self._step = make_chunk_step(cfg, intr, self.chunk, use_mask, seed,
                                     self._packed_mask)
        self.state = state
        self.ba_mode = ba_mode
        self.ba_stats: List[dict] = []
        if ba_mode == "async":
            from kbslam.ba.local_ba import make_async_ba
            from kbslam.ba.merge import make_merge

            # lru_cached factories: a per-instance jax.jit wrapper here
            # retraced on its first solve — inside the latency-sensitive
            # feed loop (the round-3 async-BA streaming collapse).
            # make_async_ba fuses snapshot+solve into one dispatch; the
            # snapshot must be a real copy because tracking donates its
            # state buffers every chunk.
            self._ba_solve = make_async_ba(cfg.ba, intr)
            self._merge = make_merge(cfg.ba)
        self._ba_inflight = None  # (snapshot_map, result_map, stats)
        if cfg.cull.enabled:
            from kbslam.mapping.cull import make_cull

            self._cull = make_cull(cfg.cull)
        else:
            self._cull = None
        if cfg.loop.enabled:
            from kbslam.loop.runner import LoopCloser

            self._loop = LoopCloser(cfg, intr)
        else:
            self._loop = None
        # public alias of the runner's event list (same list object)
        self.loop_events: List[dict] = (
            self._loop.events if self._loop is not None else [])
        # chunk-late relocalization (loop/reloc.py): when the DRAINED
        # results end in >= reloc_after consecutive failures, quiesce
        # the device stream and probe the newest drained frame against
        # the whole ring — re-anchoring lands from the next chunk
        # boundary (latency = one chunk, the documented cost of
        # chunking; round-4 verdict: the throughput path previously
        # had no recovery story at all)
        if cfg.loop.reloc_after > 0:
            from kbslam.loop.reloc import make_reloc_step

            self._reloc = make_reloc_step(
                cfg, intr, use_mask=use_mask,
                word_bits=cfg.loop.word_bits,
                score_min=cfg.loop.reloc_score_min,
                min_inliers=cfg.loop.reloc_min_inliers, seed=seed)
            self._reloc_after = int(cfg.loop.reloc_after)
            # frame idx -> (rgb post-gray, depth, mask UNPACKED) kept
            # until one past drain so the newest drained frame can be
            # re-fed to the probe
            self._frame_ring: dict = {}
        else:
            self._reloc = None
        self._fail_streak = 0
        self._kf_seen = int(state.map.num_kf)  # host-visible keyframes
        self.reloc_events: List[dict] = []
        self.tsdf = None
        self._integrate = None
        self.atlas = None
        self._submap_start = self._submap_fuse = None
        self._dense = bool(cfg.dense.enabled)
        self._dense_cfg = cfg.dense
        self._intr = intr
        self._depth_scale = cfg.map.depth_scale
        self._image_hw = (cfg.image_height, cfg.image_width)
        self._last_kf_view = None  # (pose_q, pose_t, host depth) @ last KF
        if cfg.dense.enabled:
            # keyframe fusion needs the frame's depth AFTER it drains
            # (up to 2C frames late): keep recent host depth by index
            self._depth_ring: dict = {}
            if cfg.dense.submap_every > 0:
                from kbslam.mapping.submap import (empty_atlas,
                                                   make_submap_ops)

                self.atlas = empty_atlas(cfg.dense, cfg.dense.max_submaps)
                self._submap_start, self._submap_fuse = make_submap_ops(
                    cfg.dense, intr, cfg.dense.max_submaps,
                    cfg.map.depth_scale)
                # host-side insertion bookkeeping for the chunk-late
                # fusion (matches the per-frame shell's counters):
                # global kf ids are assigned monotonically at insertion
                # (mapping/state.py num_kf), so the id of the n-th
                # DRAINED insertion is num_kf(at construction) + n —
                # no sync against the in-flight state needed. ``state``
                # is concrete here (pre-run or resumed from checkpoint).
                self._next_kf_id = int(state.map.num_kf)
                self._kf_insertions = 0
                self._active_anchor_kid = -1
                self._submaps_opened = 0
                self._kf_cap = int(state.map.kf_id.shape[0])
                # the liveness bound counts possible in-flight
                # INSERTIONS, not frames: the device step only inserts
                # via the policy (reloc is host-side, per-frame shell
                # only), so insertions are >= min_frame_gap apart
                self._min_frame_gap = max(1, int(cfg.policy.min_frame_gap))
            else:
                from kbslam.mapping.dense import empty_tsdf, make_integrate

                self.tsdf = empty_tsdf(cfg.dense)
                self._integrate = make_integrate(cfg.dense, intr,
                                                 cfg.map.depth_scale)
        self._host: List[tuple] = []
        self._inflight = []   # [(n_real, batched TrackOutput futures)]
        self._drained: List[dict] = []
        self._frame = 0   # drained-frame cursor
        self._fed = 0     # fed-frame cursor (== _frame once drained)

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

    def _collect(self, n_real, outs) -> int:
        """Drain one chunk's outputs to the host; returns how many
        frames in it inserted a keyframe (the BA/cull/loop trigger)."""
        o = jax.device_get(outs)  # hard barrier: bytes on host
        added = 0
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
                anchor_id=int(o.anchor_id[i]),
                anchor_q=np.asarray(o.anchor_q[i]),
                anchor_t=np.asarray(o.anchor_t[i]),
            ))
            if bool(o.added_kf[i]) and self._dense:
                # chunk-late TSDF fusion of the keyframe's depth at its
                # drained pose (mapping/dense.py; ~0.6 MB re-upload per
                # insertion — negligible next to the frame stream)
                self._fuse_drained_kf(np.asarray(o.pose_q[i]),
                                      np.asarray(o.pose_t[i]),
                                      self._depth_ring[self._frame])
            if self._dense:
                self._depth_ring.pop(self._frame, None)
            if self._reloc is not None:
                if bool(o.success[i]) or self._kf_seen == 0:
                    self._fail_streak = 0
                else:
                    self._fail_streak += 1
            self._kf_seen += int(bool(o.added_kf[i]))
            added += int(bool(o.added_kf[i]))
            self._frame += 1
        if self._reloc is not None:
            # keep only the newest drained frame (the reloc probe input)
            for k in list(self._frame_ring):
                if k < self._frame - 1:
                    self._frame_ring.pop(k)
        return added

    def _fuse_drained_kf(self, q_np, t_np, depth_host):
        """Fuse one drained keyframe's depth into the dense model, with
        the same cadence/gauge rules as the per-frame shell (slam.py).
        Shared by the drain loop and the reloc-inserted keyframe."""
        q, t = jnp.asarray(q_np), jnp.asarray(t_np)
        self._last_kf_view = (q_np, t_np, depth_host)
        d = jnp.asarray(depth_host)
        if self._integrate is not None:
            self.tsdf = self._integrate(self.tsdf, d, q, t)
            return
        # submap atlas (mapping/submap.py)
        kid = self._next_kf_id
        every = self._dense_cfg.submap_every
        if self._kf_insertions % every == 0:
            self.atlas = self._submap_start(self.atlas, q, t, kid)
            self._active_anchor_kid = kid
            self._submaps_opened += 1
        # BOTH fusion poses come from the live ring when the slots are
        # provably live (one gauge — a loop/pose-graph correction that
        # merged while this chunk was in flight rewrote the whole ring,
        # including this keyframe's slot; the drained pose predates it)
        q2, t2, aq, at = self._fusion_poses_now(kid, q, t)
        self.atlas = self._submap_fuse(self.atlas, d, q2, t2, aq, at)
        self._kf_insertions += 1
        self._next_kf_id += 1

    def _fusion_poses_now(self, kid, q_drained, t_drained):
        """(frame_q, frame_t, anchor_q, anchor_t) for fusing drained
        keyframe ``kid`` into the active submap, all four as LAZY device
        slices of the live (possibly still-computing) state — never a
        host sync of the in-flight chunk.

        Gauge rule (integrate_active docstring): the frame pose and the
        anchor pose must live in the SAME gauge. A loop/pose-graph
        correction that merged into the carry while this chunk was in
        flight rewrote EVERY ring pose (pose_graph carries the whole
        ring rigidly), so the drained per-frame pose predates the
        correction while the anchor's ring pose follows it — slicing
        BOTH poses from the live ring at the same instant keeps the
        pair consistent. (Async local-BA merges are NOT gauge changes —
        the window's newest keyframe is held constant, ba/merge.py — so
        for them the ring pair is simply the best current estimate.)

        The liveness check is conservative and host-only: the ring slot
        for global id ``a`` is overwritten by insertion ``a + cap``.
        The device step inserts only via the policy (>= min_frame_gap
        frames apart; relocalization is host-side and per-frame-shell
        only) EXCEPT the empty-map insertion, which bypasses the gap
        and doesn't reset the counter (pipeline.py do_insert = empty |
        add_kf), so the remaining (fed − drained − 1) in-flight frames
        can add at most 1 + floor((R−1)/gap) insertions beyond ``kid``.
        When the ANCHOR's slot could have been reallocated (kid >=
        anchor, so the anchor bound covers both slots), fall back to
        the drained pose + the atlas's stored anchor pose. The fallback
        pair is gauge-consistent only when no rigid (loop/pose-graph)
        correction merged since the submap opened — the drained pose
        would be post-correction while the stored anchor pose is
        creation-time; this matches the per-frame shell's documented
        conservatism for reallocated anchors."""
        anchor_kid = self._active_anchor_kid
        remaining = max(0, self._fed - self._frame - 1)
        # 1 + floor((R-1)/gap): the empty-map insertion bypasses the
        # policy gap (== 0 when remaining == 0 since -1//gap == -1)
        extra = 1 + (remaining - 1) // self._min_frame_gap
        if (anchor_kid >= 0
                and kid + extra < anchor_kid + self._kf_cap):
            m = self.state.map
            cap = self._kf_cap
            return (m.kf_q[kid % cap], m.kf_t[kid % cap],
                    m.kf_q[anchor_kid % cap], m.kf_t[anchor_kid % cap])
        slot = (self._submaps_opened - 1) % self.atlas.capacity
        return (q_drained, t_drained,
                self.atlas.anchor_q[slot], self.atlas.anchor_t[slot])

    def dense_surface(self) -> tuple:
        """Zero-crossing point cloud of the dense model (requires
        ``cfg.dense.enabled``): (points [M,3] world, |tsdf| residual
        [M]). Mirrors SLAM.dense_surface — submap-atlas extraction
        re-poses chunks by their anchors' CURRENT ring poses (syncs the
        live state to the host; extraction-time only, not hot)."""
        if self.atlas is not None:
            from kbslam.mapping.submap import (anchor_poses_now,
                                               extract_atlas_surface)

            return extract_atlas_surface(
                self.atlas, self._dense_cfg,
                anchor_poses_now(self.atlas, self.state.map))
        if self.tsdf is None:
            raise RuntimeError("dense mapping disabled "
                               "(SLAMConfig.dense.enabled)")
        from kbslam.mapping.dense import surface_points

        return surface_points(self.tsdf, self._dense_cfg)

    def dense_mesh(self):
        """TSDF zero-isosurface as a TriangleMesh; mirrors
        SLAM.dense_mesh (monolithic: one welded mesh; atlas: per-submap
        meshes re-posed by their anchors' CURRENT ring poses). Host-
        side, extraction-time only — syncs the live state."""
        if self.atlas is not None:
            from kbslam.mapping.submap import anchor_poses_now, atlas_mesh

            return atlas_mesh(self.atlas, self._dense_cfg,
                              anchor_poses_now(self.atlas, self.state.map))
        if self.tsdf is None:
            raise RuntimeError("dense mapping disabled "
                               "(SLAMConfig.dense.enabled)")
        from kbslam.mapping.mesh import marching_tetrahedra

        return marching_tetrahedra(self.tsdf, self._dense_cfg)

    def _scaled_intr(self, stride: int):
        """Downsampled pinhole for stride-decimated rendering (see
        SLAM._scaled_intr — exact for pixel i ↔ full pixel i*stride)."""
        from kbslam.geom.camera import Intrinsics

        if stride == 1:
            return self._intr, self._image_hw[0], self._image_hw[1]
        i = self._intr
        return (Intrinsics(i.fx / stride, i.fy / stride, i.cx / stride,
                           i.cy / stride, i.dist),
                self._image_hw[0] // stride, self._image_hw[1] // stride)

    def render_view(self, q=None, t=None, stride: int = 1):
        """Model-predicted depth/normal view (mapping/raycast.py) from
        camera-to-world (q, t), default the last DRAINED keyframe's
        pose; mirrors SLAM.render_view (world-frame normals; atlas:
        active submap re-posed by its anchor's current ring pose;
        stride decimates the gather-bound render — full 640x480 is
        ~384 ms on TPU v5e, stride 4 cuts it 16x). Host-syncs the live
        state — viewer-cadence only, not hot."""
        from kbslam.geom.se3 import quat_rotate
        from kbslam.mapping.raycast import make_raycast, resolve_render_model

        if q is None:
            if self._last_kf_view is None:
                return None
            q, t, _ = self._last_kf_view
        vol, pose, anchor = resolve_render_model(
            self.tsdf, self.atlas, self.state.map, q, t)
        if vol is None:
            return None
        intr_s, H, W = self._scaled_intr(stride)
        f = make_raycast(self._dense_cfg, intr_s, H, W)
        r = f(vol, pose.q, pose.t)
        if anchor is not None:
            n = quat_rotate(anchor.q, r.normal.reshape(-1, 3))
            r = r._replace(normal=n.reshape(r.normal.shape))
        return r

    def map_consistency(self, stride: int = 2):
        """Rendered-vs-observed depth agreement at the last drained
        keyframe; mirrors SLAM.map_consistency (the --eval summary /
        checkpoint-metadata map-quality metric; default stride 2 =
        4x cheaper render, statistics insensitive to decimation)."""
        from kbslam.mapping.raycast import (render_consistency,
                                            resolve_render_model)

        if self._last_kf_view is None:
            return None
        q, t, depth = self._last_kf_view
        vol, pose, _ = resolve_render_model(
            self.tsdf, self.atlas, self.state.map, q, t)
        if vol is None:
            return None
        intr_s, H, W = self._scaled_intr(stride)
        depth_m = (np.asarray(depth, np.float32)[::stride, ::stride]
                   * self._depth_scale)[:H, :W]
        return render_consistency(vol, pose, depth_m, intr_s,
                                  self._dense_cfg)

    def _record_ba_stats(self, s):
        """Append one solve's stats; ``s`` must already be host-side
        (device_get'd by the caller — avoids a second transfer)."""
        self.ba_stats.append(dict(
            initial_cost=float(s.initial_cost),
            final_cost=float(s.final_cost),
            iterations=int(s.iterations),
            accepted=int(s.accepted),
            num_pruned=int(s.num_pruned),
        ))

    def _kf_tick(self, n_added: int, block: bool = False):
        """Chunk-late keyframe-triggered work, in dependency order:
        cull, async-BA merge-if-ready, loop probes (pending-queued in
        loop/runner.py — deferred while a solve is in flight, since its
        merge would write PRE-correction window poses over the corrected
        ring), then the new BA dispatch LAST so the solve runs on
        post-correction poses (at most one in flight — the reference's
        atomic baRunning flag, main.cpp:22-47). ``n_added`` counts
        keyframe insertions among the DRAINED frames — never read off
        the in-flight carry, which would force a host sync on the
        still-computing chunk."""
        added_kf = n_added > 0
        if added_kf and self._cull is not None:
            self.state = self.state._replace(map=self._cull(self.state.map))
        if self.ba_mode == "async" and self._ba_inflight is not None:
            snapshot, result, stats = self._ba_inflight
            if block or all(leaf.is_ready() for leaf in jax.tree.leaves(stats)):
                self.state = self.state._replace(
                    map=self._merge(self.state.map, snapshot, result))
                # device_get doubles as the hard barrier under block=True:
                # block_until_ready can return before work completes on the
                # tunneled runtime (CLAUDE.md gotcha #2); moving the bytes
                # to the host is a real barrier, and the merge under block
                # is unconditional, mirroring SLAM.finish.
                self._record_ba_stats(jax.device_get(stats))
                self._ba_inflight = None
        if self._loop is not None:
            if n_added:
                self._loop.note_insertions(n_added)
            self.state = self._loop.tick(self.state, self._frame,
                                         self._ba_inflight)
        if (self.ba_mode == "async" and added_kf
                and self._ba_inflight is None):
            # ONE async dispatch: snapshot-copy + solve fused
            self._ba_inflight = self._ba_solve(self.state.map)

    def _maybe_reloc(self):
        """Chunk-late relocalization attempt: fires only when the
        DRAINED tail shows >= reloc_after consecutive failures and no
        async BA solve is in flight (its merge would clobber the fresh
        anchor — the per-frame shell's gate, slam._reloc_tick).

        Quiesces the device stream first (drains in-flight chunks):
        (a) an in-flight chunk may have recovered on its own — its
        drained successes reset the streak and skip a spurious reloc;
        (b) with dense submaps the host insertion-id bookkeeping
        (_next_kf_id) requires no device-policy insertions in flight
        when the host-side reloc insertion lands. Tracking is >= N
        frames lost here, so the stall costs nothing that matters."""
        if (self._reloc is None or self._ba_inflight is not None
                or self._fail_streak < self._reloc_after):
            return
        if self._inflight:
            added = 0
            while self._inflight:
                added += self._collect(*self._inflight.pop(0))
            self._kf_tick(added)   # may dispatch BA -> retry next feed
            if (self._ba_inflight is not None
                    or self._fail_streak < self._reloc_after):
                return
        data = self._frame_ring.get(self._frame - 1)
        if data is None:
            return
        rgb, dep, msk = data
        args = [jnp.asarray(rgb), jnp.asarray(dep)]
        if self.use_mask:
            args.append(jnp.asarray(
                msk if msk is not None
                else np.ones(dep.shape[:2], np.uint8)))
        self.state, r = self._reloc(self.state, *args)
        if not bool(r.success):   # host sync: tiny scalars, lost anyway
            return
        self._fail_streak = 0
        self._kf_seen += 1
        slot = int(r.slot)
        self.reloc_events.append(dict(
            frame=self._frame - 1,
            matched_id=int(self.state.map.kf_id[slot])
            if slot < self.state.map.capacity_kf else -1,
            score=float(r.score), inliers=int(r.num_inliers)))
        # the reloc frame is a fresh keyframe: fuse its depth like any
        # drained insertion (per-frame shell parity — its reloc'd
        # frames run the dense tick with added_kf set)
        if self._dense:
            self._fuse_drained_kf(np.asarray(r.pose_q),
                                  np.asarray(r.pose_t),
                                  np.asarray(dep))

    def feed(self, rgb, depth, mask=None) -> List[dict]:
        """Add one frame; returns any newly drained per-frame results."""
        if self._dense:
            self._depth_ring[self._fed] = depth
        self._fed += 1
        if self.gray and rgb.ndim == 3:
            from kbslam.frontend.image import GRAY_WEIGHTS
            # round (not truncate): keeps the u8 quantization within the
            # documented 0.5 gray levels of the device float path
            rgb = np.round(
                np.asarray(rgb, np.float32)
                @ np.array(GRAY_WEIGHTS, np.float32)
            ).astype(np.uint8)
        if self._reloc is not None:
            # post-gray rgb + UNPACKED mask: the probe re-feeds the
            # frame exactly as the track step saw it
            self._frame_ring[self._fed - 1] = (rgb, depth, mask)
        if self.use_mask:
            if mask is None:
                mask = np.ones(depth.shape[:2], np.uint8)
            if self._packed_mask:
                mask = np.packbits(
                    np.asarray(mask, np.uint8).reshape(depth.shape[0], -1) > 0,
                    axis=-1)
            self._host.append((rgb, depth, mask))
        else:
            self._host.append((rgb, depth))
        if len(self._host) == self.chunk:
            self._dispatch(self.chunk)
        out: List[dict] = []
        # keep ONE chunk in flight: drain older results while the newest
        # chunk computes (downward transfer overlaps device work)
        added = 0
        while len(self._inflight) > 1:
            added += self._collect(*self._inflight.pop(0))
        self._kf_tick(added)
        self._maybe_reloc()
        if self._drained:
            out, self._drained = self._drained, []
        return out

    def flush(self) -> List[dict]:
        """Pad + dispatch the partial chunk, drain every result and any
        in-flight BA solve (end-of-sequence)."""
        if self._host:
            n_real = len(self._host)
            while len(self._host) < self.chunk:
                self._host.append(self._host[-1])
            self._dispatch(n_real)
        added = 0
        while self._inflight:
            added += self._collect(*self._inflight.pop(0))
        self._kf_tick(added, block=True)
        if self._ba_inflight is not None:  # solve dispatched just above
            self._kf_tick(0, block=True)
        out, self._drained = self._drained, []
        return out

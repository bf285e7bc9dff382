"""Host-side loop-closure runner shared by the per-frame shell
(slam.SLAM) and the chunked streaming executor (streaming.ChunkedStream).

One implementation of the probe/close/event bookkeeping both paths need
(they previously carried near-verbatim copies, which let the chunked
copy grow an ordinal-accounting bug), plus the two host-scheduling
rules that make loop closure compose with async BA:

  - **Pending queue.** A probe must not run while an async BA solve is
    in flight — the solve's merge would write PRE-correction window
    poses over the corrected ring. Instead of dropping those probes
    (which silently disabled loop closure whenever BA kept the pipe
    busy — e.g. ``--ba async`` dispatches a solve on every insertion),
    insertions enqueue their keyframe ordinal and the queue drains on
    the first tick with no solve in flight. Stale entries (keyframe
    evicted by a ring wrap, or culled) are self-invalidating: the probe
    gates on ``kf_id[slot] == query_id`` in-graph (detect.py), so a
    late probe of a recycled slot is a masked no-op, not a wrong loop.
  - **Host-only accounting.** Ordinals are counted from the caller's
    host-visible insertion events (drained chunk outputs / device_get'd
    per-frame outputs), never from ``map.num_kf`` — reading that on the
    chunked path forces a host sync on the still-computing in-flight
    chunk, defeating the one-chunk-in-flight overlap.

The reference has no loop closure (SURVEY §5.3); kbslam/loop/ is a
capability extension, off by default (LoopConfig.enabled).
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp


class LoopCloser:
    """Probe/close scheduler. Callers report keyframe insertions via
    ``note_insertions`` and call ``tick`` whenever closing is safe to
    attempt; ``tick`` returns the (possibly corrected) state."""

    def __init__(self, cfg, intr):
        from kbslam.loop.closure import make_close_loop
        from kbslam.loop.detect import make_loop_probe

        lc = cfg.loop
        self._probe = make_loop_probe(
            cfg, intr, word_bits=lc.word_bits,
            min_separation=lc.min_separation, score_min=lc.score_min,
            min_inliers=lc.min_inliers,
            max_trans_disc=lc.max_trans_disc,
            max_rot_disc_deg=lc.max_rot_disc_deg)
        self._close = make_close_loop(lc.max_iterations, lc.loop_weight)
        self.events: List[dict] = []
        self._pending: List[int] = []  # keyframe ordinals awaiting probe
        self._num_insertions = 0

    def note_insertions(self, n: int = 1):
        """Record n keyframe insertions (host-visible events only)."""
        for _ in range(n):
            self._num_insertions += 1
            self._pending.append(self._num_insertions)

    def tick(self, state, frame: int, ba_inflight):
        """Drain pending probes unless an async BA solve is in flight
        (its merge would overwrite the correction — deferred entries
        retry on the next tick). Returns the updated state."""
        if ba_inflight is not None:
            return state
        while self._pending:
            ordinal = self._pending.pop(0)
            m = state.map
            qslot = jnp.int32((ordinal - 1) % m.capacity_kf)
            qid = jnp.int32(ordinal - 1)
            key = jax.random.fold_in(jax.random.PRNGKey(0x100B), ordinal)
            cand, cons = self._probe(m, qslot, qid, key)
            if not bool(cons.ok):
                continue
            new_map, stats = self._close(m, cand.slot, qslot,
                                         cons.rel_q, cons.rel_t, cons.ok)
            state = state._replace(map=new_map)
            self.events.append(dict(
                frame=frame,
                query_id=ordinal - 1,
                cand_id=int(m.kf_id[cand.slot]),
                score=float(cand.score),
                inliers=int(cons.num_inliers),
                pg_initial_cost=float(stats.initial_cost),
                pg_final_cost=float(stats.final_cost),
                pg_accepted=int(stats.accepted),
            ))
        return state

"""Profiling utilities (SURVEY §5.1): stage wall-clock spans like the
reference's chrono prints around BA setup/solve (Optimizers.cpp:194-220),
plus a jax.profiler trace context for full device timelines.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List


class StageTimer:
    """Accumulates wall-clock spans per named stage."""

    def __init__(self):
        self.spans: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.spans[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self.spans.items():
            xs_sorted = sorted(xs)
            n = len(xs_sorted)
            out[name] = dict(
                count=n,
                total_ms=sum(xs) * 1e3,
                mean_ms=sum(xs) / n * 1e3,
                p50_ms=xs_sorted[n // 2] * 1e3,
                max_ms=xs_sorted[-1] * 1e3,
            )
        return out

    def report(self) -> str:
        lines = [f"{'stage':24s} {'count':>6s} {'mean ms':>9s} {'p50 ms':>9s} {'max ms':>9s}"]
        for name, s in sorted(self.summary().items()):
            lines.append(
                f"{name:24s} {s['count']:6d} {s['mean_ms']:9.2f} "
                f"{s['p50_ms']:9.2f} {s['max_ms']:9.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/kbslam_trace"):
    """jax.profiler trace context — inspect with TensorBoard's profile
    plugin, or ship the xplane protos to your profiling stack."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()

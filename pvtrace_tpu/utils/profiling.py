"""Profiling and observability.

The reference measures wall-clock only (``engine/api.py:232-245``
``EngineResult.elapsed``; studio live rays/s ``studio/server.py:244-249``).
Here photons/s is a first-class metric with a reusable meter, plus
`jax.profiler` trace capture for XLA-level analysis (op fusion, HBM
traffic, step time) viewable in TensorBoard/Perfetto.
"""
import contextlib
import time


class Timer:
    """Wall-clock context: ``with Timer() as t: ...; t.elapsed``."""

    def __enter__(self):
        self.elapsed = 0.0
        self._tic = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._tic
        return False


class ThroughputMeter:
    """Accumulates (photons, seconds) samples; reports photons/s.

    Use per bundle/stream to observe steady-state throughput separately
    from compile time: the first sample (compile + trace) is reported
    as `first_sample_rate`, the rest as `steady_rate`.
    """

    def __init__(self):
        self.samples = []  # (photons, seconds)

    def add(self, photons, seconds):
        self.samples.append((int(photons), float(seconds)))

    @contextlib.contextmanager
    def measure(self, photons):
        tic = time.perf_counter()
        yield
        self.add(photons, time.perf_counter() - tic)

    @property
    def photons(self):
        return sum(n for n, _ in self.samples)

    @property
    def seconds(self):
        return sum(s for _, s in self.samples)

    @property
    def rate(self):
        """Overall photons/s including the first (compiling) sample."""
        return self.photons / self.seconds if self.seconds > 0 else 0.0

    @property
    def first_sample_rate(self):
        if not self.samples:
            return 0.0
        n, s = self.samples[0]
        return n / s if s > 0 else 0.0

    @property
    def steady_rate(self):
        """photons/s excluding the first sample (compile amortised)."""
        if len(self.samples) < 2:
            return self.rate
        n = sum(k for k, _ in self.samples[1:])
        s = sum(t for _, t in self.samples[1:])
        return n / s if s > 0 else 0.0

    def summary(self):
        return {
            "photons": self.photons,
            "seconds": round(self.seconds, 6),
            "rate": round(self.rate, 1),
            "steady_rate": round(self.steady_rate, 1),
            "samples": len(self.samples),
        }


@contextlib.contextmanager
def trace_profile(log_dir):
    """Capture a jax.profiler trace of the enclosed block.

    The trace (XLA ops, fusion boundaries, HBM transfers, step time)
    lands in `log_dir` and opens with TensorBoard's profile plugin or
    Perfetto. Compile once before profiling to see steady-state steps.
    """
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None):
    """Per-device memory statistics (bytes), or {} when unsupported."""
    import jax

    if device is None:
        device = jax.devices()[0]
    stats = getattr(device, "memory_stats", None)
    if stats is None:
        return {}
    try:
        return dict(stats() or {})
    except Exception:
        return {}

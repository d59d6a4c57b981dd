"""Profiling utility tests."""
import time

from pvtrace_tpu.utils import ThroughputMeter, Timer, device_memory_stats


def test_timer():
    with Timer() as t:
        time.sleep(0.01)
    assert t.elapsed >= 0.01


def test_throughput_meter():
    meter = ThroughputMeter()
    meter.add(1000, 2.0)   # "compile" sample
    meter.add(4000, 1.0)
    meter.add(4000, 1.0)
    assert meter.photons == 9000
    assert abs(meter.rate - 9000 / 4.0) < 1e-9
    assert abs(meter.steady_rate - 8000 / 2.0) < 1e-9
    assert abs(meter.first_sample_rate - 500.0) < 1e-9
    summary = meter.summary()
    assert summary["samples"] == 3
    with meter.measure(100):
        pass
    assert meter.photons == 9100


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict)

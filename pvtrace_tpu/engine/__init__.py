"""The compiled device engine: scene compiler + wavefront tracer + API.

Usage mirrors the reference engine (``pvtrace/engine``):

    from pvtrace_tpu import engine
    result = engine.simulate(scene, 100_000)
    result.recorders["top-escape"].rays

Scenes outside the compiled subset raise ``UnsupportedSceneError``;
fall back to ``pvtrace_tpu.algorithm.photon_tracer``.
"""
from pvtrace_tpu.engine.api import (
    EngineResult,
    RecorderResult,
    is_available,
    simulate,
    simulate_stream,
)
from pvtrace_tpu.engine.checkpoint import (
    AccumulatedResult,
    simulate_checkpointed,
)
from pvtrace_tpu.engine.compiler import (
    CompiledScene,
    UnsupportedSceneError,
    compile_scene,
)
from pvtrace_tpu.engine.recorder import Heatmap, Histogram, Recorder
from pvtrace_tpu.engine.tally import tally_histories

__all__ = [
    "EngineResult",
    "RecorderResult",
    "is_available",
    "simulate",
    "simulate_stream",
    "AccumulatedResult",
    "simulate_checkpointed",
    "CompiledScene",
    "UnsupportedSceneError",
    "compile_scene",
    "Heatmap",
    "Histogram",
    "Recorder",
    "tally_histories",
]

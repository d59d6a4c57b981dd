from pvtrace_tpu.diff import transport

__all__ = ["transport"]

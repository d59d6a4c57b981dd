"""Build the native mesh kernel in place.

Parity: reference ``pvtrace/engine/build.py`` (in-place cythonize with
-O3/-fopenmp and serial fallback) — here the native component is the
C++ mesh ray-casting kernel (the compute path needs no native build; it
is JAX/XLA).

Usage: ``python -m pvtrace_tpu.native.build``
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.realpath(__file__))
SOURCE = os.path.join(HERE, "mesh_kernel.cpp")
LIBRARY = os.path.join(HERE, "_mesh_kernel.so")


def build(verbose=True):
    """Compile the kernel; tries OpenMP first, serial fallback."""
    for flags in (["-fopenmp"], []):
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            *flags, SOURCE, "-o", LIBRARY,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            if verbose:
                mode = "OpenMP" if flags else "serial"
                print(f"Built {LIBRARY} ({mode})")
            return LIBRARY
        except (subprocess.CalledProcessError, FileNotFoundError) as err:
            last_error = err
    raise RuntimeError(f"Could not build mesh kernel: {last_error}")


if __name__ == "__main__":
    sys.exit(0 if build() else 1)

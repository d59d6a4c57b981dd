"""Multi-host execution: 2 JAX processes over one global mesh.

The 2-process run (4 virtual CPU devices per process, Gloo collectives
between processes) must produce tallies bitwise equal to the
single-process 8-device run: per-photon RNG streams are pure functions
of (seed, global photon id), so the process topology cannot matter —
the multi-host analogue of the reference's scheduling-independence
guarantee (reference tests/test_engine.py:169-176).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(process_id, num_processes, port, out_path, devices_per_proc):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, _WORKER, str(process_id), str(num_processes),
         str(port), out_path],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )


def _run_workers(num_processes, devices_per_proc, tmp_path, tag):
    port = _free_port()
    procs, paths = [], []
    for pid in range(num_processes):
        out = str(tmp_path / f"{tag}-{pid}.json")
        paths.append(out)
        procs.append(
            _spawn(pid, num_processes, port, out, devices_per_proc)
        )
    results = []
    for proc, path in zip(procs, paths):
        stdout, _ = proc.communicate(timeout=600)
        assert proc.returncode == 0, stdout.decode(errors="replace")[-3000:]
        with open(path) as fh:
            results.append(json.load(fh))
    return results


@pytest.mark.slow
def test_two_process_tallies_match_single_process(tmp_path):
    single = _run_workers(1, 8, tmp_path, "single")[0]
    double = _run_workers(2, 4, tmp_path, "double")

    assert single["n_devices"] == 8
    for result in double:
        assert result["n_processes"] == 2
        assert result["n_devices"] == 8

    # Both processes hold identical replicated tallies.
    assert double[0]["fates"] == double[1]["fates"]
    assert double[0]["distinct"] == double[1]["distinct"]

    # Integer tallies are bitwise independent of the process topology.
    for key in ("fates", "distinct", "cross", "bins"):
        assert double[0][key] == single[key], key
    # Cross-process psum may order float additions differently.
    np.testing.assert_allclose(
        np.asarray(double[0]["sums"], dtype=float),
        np.asarray(single["sums"], dtype=float),
        rtol=1e-6,
    )
    # The photon budget is fully accounted for.
    assert int(np.sum(single["fates"])) == 4096

    # The unbiased gradient estimator all-reduces across processes too:
    # score-pass fate counters stay bitwise equal, the [fate, channel]
    # score sums agree to cross-process summation order, and the
    # gradient signal is non-trivial.
    assert double[0]["score_fates"] == double[1]["score_fates"]
    assert double[0]["score_fates"] == single["score_fates"]
    assert double[0]["fate_scores"] == double[1]["fate_scores"]
    single_scores = np.asarray(single["fate_scores"], dtype=float)
    double_scores = np.asarray(double[0]["fate_scores"], dtype=float)
    # f32 accumulators with cancellation: loose absolute floor.
    np.testing.assert_allclose(
        double_scores, single_scores, rtol=1e-3, atol=0.5
    )
    assert np.abs(single_scores).max() > 0

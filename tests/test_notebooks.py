"""Notebook smoke tests: the shipped tutorial/validation notebooks must
execute end-to-end (the role the reference's examples/*.ipynb play).

Executed with nbclient at a reduced photon count via the
PVTRACE_TPU_VALIDATE_N environment variable.
"""
import os

import nbformat
import pytest
from nbclient import NotebookClient

EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)


@pytest.mark.slow
def test_validation_notebook_executes(monkeypatch):
    monkeypatch.setenv("PVTRACE_TPU_VALIDATE_N", "2500")
    monkeypatch.setenv("MPLBACKEND", "Agg")
    repo = os.path.dirname(EXAMPLES)
    monkeypatch.setenv(
        "PYTHONPATH",
        repo + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    path = os.path.join(EXAMPLES, "validation.ipynb")
    nb = nbformat.read(path, as_version=4)
    client = NotebookClient(
        nb, timeout=1500, kernel_name="python3",
        resources={"metadata": {"path": EXAMPLES}},
    )
    client.execute()  # raises CellExecutionError on any failing cell
    # The fate-fraction assertions live in the notebook itself; reaching
    # here means every cell ran and the ±4% flux-model checks passed.


@pytest.mark.slow
def test_quick_start_notebook_executes(monkeypatch):
    monkeypatch.setenv("MPLBACKEND", "Agg")
    repo = os.path.dirname(EXAMPLES)
    monkeypatch.setenv(
        "PYTHONPATH",
        repo + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    path = os.path.join(EXAMPLES, "quick_start.ipynb")
    nb = nbformat.read(path, as_version=4)
    client = NotebookClient(
        nb, timeout=1500, kernel_name="python3",
        resources={"metadata": {"path": EXAMPLES}},
    )
    client.execute()


@pytest.mark.slow
def test_lsc_notebook_executes(monkeypatch):
    monkeypatch.setenv("PVTRACE_TPU_LSC_N", "600")
    monkeypatch.setenv("MPLBACKEND", "Agg")
    repo = os.path.dirname(EXAMPLES)
    monkeypatch.setenv(
        "PYTHONPATH",
        repo + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    path = os.path.join(EXAMPLES, "lsc.ipynb")
    nb = nbformat.read(path, as_version=4)
    client = NotebookClient(
        nb, timeout=1500, kernel_name="python3",
        resources={"metadata": {"path": EXAMPLES}},
    )
    client.execute()


@pytest.mark.slow
def test_gradients_notebook_executes(monkeypatch):
    monkeypatch.setenv("PVTRACE_TPU_GRAD_N", "40000")
    monkeypatch.setenv("MPLBACKEND", "Agg")
    repo = os.path.dirname(EXAMPLES)
    monkeypatch.setenv(
        "PYTHONPATH",
        repo + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    path = os.path.join(EXAMPLES, "gradients.ipynb")
    nb = nbformat.read(path, as_version=4)
    client = NotebookClient(
        nb, timeout=1500, kernel_name="python3",
        resources={"metadata": {"path": EXAMPLES}},
    )
    client.execute()


@pytest.mark.slow
@pytest.mark.parametrize("name", [
    "002_materials",
    "003_lights",
    "004_nodes",
    "005_geometry",
    "006_coatings",
])
def test_numbered_tutorial_notebook_executes(monkeypatch, name):
    """The numbered tutorials mirror the reference's 002-006 notebooks
    (examples/002 Materials.ipynb ... 006 Coatings.ipynb); regenerate
    with examples/make_tutorial_notebooks.py."""
    monkeypatch.setenv("MPLBACKEND", "Agg")
    repo = os.path.dirname(EXAMPLES)
    monkeypatch.setenv(
        "PYTHONPATH",
        repo + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    path = os.path.join(EXAMPLES, f"{name}.ipynb")
    nb = nbformat.read(path, as_version=4)
    client = NotebookClient(
        nb, timeout=1500, kernel_name="python3",
        resources={"metadata": {"path": EXAMPLES}},
    )
    client.execute()

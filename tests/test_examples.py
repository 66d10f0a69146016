"""Rot protection for the runnable examples: each script is the reference
GUI's capability surface as a demo (SURVEY.md §2 C11), so a silent break is
a parity regression. All run on the CPU backend at their built-in sizes;
the heavier ones are `slow`-marked like the other end-to-end tests."""

import runpy
import sys

import numpy as np
import pytest


def _run(path, argv=("x",)):
    old = sys.argv
    sys.argv = list(argv)
    try:
        runpy.run_path(path, run_name="__main__")
    finally:
        sys.argv = old


@pytest.mark.slow
def test_example_sdf_circle(capsys):
    _run("examples/sdf_circle.py")
    assert "OK" in capsys.readouterr().out


@pytest.mark.slow
def test_example_sdf_sphere_3d(capsys):
    _run("examples/sdf_sphere_3d.py")
    out = capsys.readouterr().out
    assert "OK" in out and "device compact extraction" in out


@pytest.mark.slow
def test_example_interactive_warmstart(capsys):
    _run("examples/interactive_warmstart.py")
    out = capsys.readouterr().out
    assert "warm" in out.lower() or "OK" in out


@pytest.mark.slow
def test_example_demo_app_oneshot(capsys):
    _run("examples/demo_app.py",
         ("x", "--cpu", "--grid", "64", "--n", "200", "--no-render",
          "--records"))
    out = capsys.readouterr().out
    assert "rel_residual" in out or "RMSE" in out.upper() or "rmse" in out


@pytest.mark.slow
def test_example_sharded_demo(capsys):
    # 128² instead of the demo's default 256²: same three code paths
    # (unsharded, sharded, sharded-refined), ~3x cheaper on the 1-core host.
    _run("examples/sharded_demo.py", ("x", "--grid", "128", "--n", "400"))
    out = capsys.readouterr().out
    assert "OK" in out


@pytest.mark.slow
def test_example_demo_1d(capsys):
    # Small lattice keeps the three per-preset jit compiles quick; the
    # preset comparison is the reference GUI's 1D mode (SURVEY.md §1 L4).
    _run("examples/demo_1d.py", ("x", "--cpu", "--size", "96", "--n", "7"))
    out = capsys.readouterr().out
    assert "order-2 (stiff rod)" in out and "RMSE" in out


@pytest.mark.slow
def test_example_demo_1d_gradients(capsys):
    _run("examples/demo_1d.py",
         ("x", "--cpu", "--size", "96", "--n", "7", "--gradients",
          "--w2", "0.5"))
    out = capsys.readouterr().out
    assert "custom" in out and "RMSE" in out

"""Smoke test: the shipped examples run end to end."""

import runpy
import os

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def test_link_budget_study(capsys):
    runpy.run_path(os.path.join(EXAMPLES, "link_budget_study.py"),
                   run_name="__main__")
    out = capsys.readouterr().out
    assert "zenith" in out
    assert out.count("\n") >= 5


@pytest.mark.slow
def test_orbit_sweep_example(capsys):
    runpy.run_path(os.path.join(EXAMPLES, "orbit_sweep.py"),
                   run_name="__main__")
    out = capsys.readouterr().out
    assert "elev" in out

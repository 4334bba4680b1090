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


def test_long_temporal_ar_example(capsys):
    runpy.run_path(os.path.join(EXAMPLES, "long_temporal_ar.py"),
                   run_name="__main__")
    out = capsys.readouterr().out
    assert "steps/s" in out
    assert "fade probability" in out


def test_modem_gmi_example(capsys):
    runpy.run_path(os.path.join(EXAMPLES, "modem_gmi_study.py"),
                   run_name="__main__")
    out = capsys.readouterr().out
    assert "GMI" in out
    assert "16-QAM" in out


def test_orbit_temporal_scan_example(capsys):
    runpy.run_path(os.path.join(EXAMPLES, "orbit_temporal_scan.py"),
                   run_name="__main__")
    out = capsys.readouterr().out
    assert "fade dur" in out
    assert out.count("\n") >= 5


def test_doc_build(tmp_path):
    """The markdown doc site builds: every page renders non-trivially
    (the reference ships a sphinx site, doc/index.rst — this is the
    in-image equivalent; no sphinx available)."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "build_docs", os.path.join(os.path.dirname(__file__), "..",
                                   "docs", "build_docs.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    written = mod.build(str(tmp_path))
    assert len(written) >= 8
    for f in written:
        with open(f) as fh:
            html = fh.read()
        assert "<main>" in html and len(html) > 1500

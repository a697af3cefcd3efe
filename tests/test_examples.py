"""The examples are product surface (the 'switching guide' and the composed
dedup pipeline) — smoke-run them at sf0.001 so refactors can't silently
break them."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name: str):
    path = os.path.join(REPO, "examples", f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dedup_pipeline_example_runs(spark, capsys):
    _load("dedup_pipeline").main("/root/testdata/sf0.001")
    out = capsys.readouterr().out
    assert "after near-dup:" in out and "kept corpus:" in out


def test_tutorial_parity_example_runs(spark, capsys):
    _load("tutorial_parity").main("/root/testdata/sf0.001")
    out = capsys.readouterr().out
    assert "complete" in out


def test_corpus_prep_example_runs(spark, capsys):
    _load("corpus_prep").main("/root/testdata/sf0.001")
    out = capsys.readouterr().out
    assert "after decontamination:" in out and "corpus prep complete" in out


def test_ann_pipeline_example_runs(spark, capsys):
    _load("ann_pipeline").main("/root/testdata/sf0.001")
    out = capsys.readouterr().out
    assert "quantizer:" in out and "ADC top-5:" in out
    assert "ann pipeline complete" in out


def test_streaming_monitor_example_runs(spark, capsys, tmp_path):
    _load("streaming_monitor").main(str(tmp_path / "mon"))
    out = capsys.readouterr().out
    assert "SHIFTED" in out  # the planted mix flip alarmed
    assert "streaming monitor complete" in out


def test_streaming_ann_ingest_example_runs(spark, capsys, tmp_path):
    _load("streaming_ann_ingest").main("/root/testdata/sf0.001", str(tmp_path / "ann"))
    out = capsys.readouterr().out
    assert "admitted" in out
    assert "streaming ann ingest complete" in out


def test_quality_audit_example_runs(spark, capsys):
    _load("quality_audit").main("/root/testdata/sf0.001")
    out = capsys.readouterr().out
    assert "referential integrity" in out and "[OK ]" in out
    assert "quality audit complete (clean)" in out

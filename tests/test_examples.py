"""Smoke tests for the example training scripts (synthetic data, tiny
configs) — the end-to-end L5 layer."""
import runpy
import sys

import pytest


def _run(script, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", [script] + argv)
    runpy.run_path(script, run_name="__main__")


def test_cifar10_one_epoch(tmp_path, monkeypatch, capsys):
    import examples  # noqa: F401  (ensures repo root on path via conftest)
    _run("examples/cifar10.py",
         ["--synthetic", "--epochs", "1", "--batch-size", "256",
          "--out", str(tmp_path / "c10")], monkeypatch)
    out = capsys.readouterr().out
    assert "test acc" in out
    assert "Best accuracy" in out


def test_imagenet_two_steps(tmp_path, monkeypatch, capsys):
    _run("examples/imagenet.py",
         ["--synthetic", "--epochs", "1", "--batch-size", "16",
          "--step", "0", "--image-size", "32", "--steps-per-epoch", "2",
          "--print-freq", "1", "--model-parallel", "2",
          "--out", str(tmp_path / "inet")], monkeypatch)
    out = capsys.readouterr().out
    assert "mesh" in out
    assert "Acc@1" in out

"""Unit tests for the optional-protobuf discovery (compat.py) failure
paths — the half-imported-namespace cleanup and the "anything can raise at
import time" hardening.  No SparkSession needed; pure import machinery.
"""

from __future__ import annotations

import os
import sys
import types

import pytest

from kafka_streams_one_to_many_join_spark import compat


@pytest.fixture
def _state_guard(monkeypatch):
    """Snapshot/restore sys.path, the google.* module cache, and the env
    vars compat mutates, so probe side effects can't leak across tests."""
    path_before = list(sys.path)
    google_mods_before = {
        m: sys.modules[m] for m in list(sys.modules) if m.startswith("google")
    }
    monkeypatch.setenv("SPARK_GRAFT_PROTOBUF_DIR", "")
    monkeypatch.delenv("SPARK_GRAFT_PROTOBUF_DIR", raising=False)
    yield
    sys.path[:] = path_before
    for m in [m for m in sys.modules if m.startswith("google")]:
        if m not in google_mods_before:
            del sys.modules[m]
    sys.modules.update(google_mods_before)


@pytest.fixture
def _force_probe_path(_state_guard):
    """Make the probe import actually hit the candidate dir: evict cached
    google.* modules and strip any already-resolved runtime dirs from
    sys.path (a cached module satisfies ``import`` regardless of path, so
    without this the probe can't fail).  _state_guard restores both."""
    for m in [m for m in sys.modules if m.startswith("google")]:
        del sys.modules[m]
    sys.path[:] = [
        p
        for p in sys.path
        if not os.path.isdir(os.path.join(p, "google", "protobuf"))
    ]
    yield


def _fake_runtime(tmp_path, body: str):
    """A directory laid out like a vendored protobuf runtime whose
    ``descriptor`` module has the given body."""
    pkg = tmp_path / "google" / "protobuf"
    pkg.mkdir(parents=True)
    (tmp_path / "google" / "__init__.py").write_text("")
    (pkg / "__init__.py").write_text("")
    (pkg / "descriptor.py").write_text(body)
    return str(tmp_path)


def test_importable_failure_restores_path_and_modules(tmp_path, _force_probe_path):
    """A runtime that raises ImportError at import: path entry removed,
    probe-added google.* modules evicted."""
    cand = _fake_runtime(tmp_path, "raise ImportError('broken runtime')")
    probe_added_before = set(sys.modules)
    assert compat._importable(cand) is False
    assert cand not in sys.path
    # nothing half-imported from the probe survives
    for m in set(sys.modules) - probe_added_before:
        assert not m.startswith("google"), f"leaked half-import: {m}"


def test_importable_catches_non_import_errors(tmp_path, _force_probe_path):
    """An incompatible copy raising SyntaxError/AttributeError (e.g. a
    Python-2-era runtime) must degrade to False, not escape and crash the
    streaming package import (ADVICE r05, medium)."""
    cand = _fake_runtime(tmp_path, "def broken(:\n")  # SyntaxError at import
    assert compat._importable(cand) is False
    assert cand not in sys.path
    cand2 = _fake_runtime(
        tmp_path / "attr", "import sys\nraise AttributeError('py2-era')"
    )
    assert compat._importable(cand2) is False
    assert cand2 not in sys.path


def test_importable_preserves_preexisting_google_modules(
    tmp_path, _force_probe_path, monkeypatch
):
    """Failure cleanup must evict only modules the probe itself added —
    a fully-imported unrelated ``google.*`` package (e.g. google.auth) keeps
    its sys.modules identity (ADVICE r05, low)."""
    sentinel = types.ModuleType("google.auth")
    monkeypatch.setitem(sys.modules, "google.auth", sentinel)
    cand = _fake_runtime(tmp_path, "raise ImportError('nope')")
    assert compat._importable(cand) is False
    assert sys.modules.get("google.auth") is sentinel


def test_ensure_protobuf_survives_broken_explicit_dir(
    tmp_path, _force_probe_path, monkeypatch
):
    """A user-supplied SPARK_GRAFT_PROTOBUF_DIR pointing at a broken copy
    degrades to "no runtime found" (False), never an exception.  The probe
    path is forced by the _force_probe_path fixture."""
    cand = _fake_runtime(tmp_path, "raise SyntaxError('ancient')")
    monkeypatch.setenv("SPARK_GRAFT_PROTOBUF_DIR", cand)
    monkeypatch.setattr(compat, "_WELL_KNOWN_PROTOBUF_DIRS", ())
    assert compat.ensure_protobuf() is False
    assert cand not in sys.path
    assert cand not in os.environ.get("PYTHONPATH", "").split(os.pathsep)


def test_version_knob_not_set_for_gencode_incapable_runtime(
    tmp_path, _force_probe_path, monkeypatch
):
    """A runtime importable but lacking internal.builder (too old for
    pyspark's gencode) is rejected BEFORE the version-check override is set
    (ADVICE r05: verify capability before disabling the check).

    The probe path is forced by the _force_probe_path fixture even where
    the package import already resolved a runtime.
    """
    cand = _fake_runtime(tmp_path, "")  # imports fine, no internal.builder
    monkeypatch.setenv("SPARK_GRAFT_PROTOBUF_DIR", cand)
    monkeypatch.setattr(compat, "_WELL_KNOWN_PROTOBUF_DIRS", ())
    monkeypatch.delenv("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", raising=False)
    prev_pythonpath = os.environ.get("PYTHONPATH", "")
    assert compat.ensure_protobuf() is False
    assert "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK" not in os.environ
    assert os.environ.get("PYTHONPATH", "") == prev_pythonpath

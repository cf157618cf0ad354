"""Driver-contract tests for __graft_entry__.py.

The round-1 failure mode was exactly this: dryrun_multichip was correct when
handed the right platform but red under the driver's bare call (pinned axon
platform -> 1 device, MULTICHIP_r01.json rc=1). These tests pin both paths:

- direct path: the test process already has 8 virtual CPU devices
  (tests/conftest.py), so dryrun_multichip(8) runs in-process.
- bootstrap path: requesting MORE devices than this process has forces the
  subprocess re-exec with a freshly forced
  ``--xla_force_host_platform_device_count`` — the same machinery the bare
  driver call from the axon platform takes.
"""

import subprocess
import sys

import pytest


def _load_entry_module():
    import importlib.util
    from pathlib import Path

    path = Path(__file__).resolve().parent.parent / "__graft_entry__.py"
    spec = importlib.util.spec_from_file_location("__graft_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dryrun_direct_path(devices):
    g = _load_entry_module()
    g.dryrun_multichip(8)  # raises on failure


def test_dryrun_bootstrap_subprocess(devices):
    """16 > 8 available devices -> must take the re-exec path and still pass."""
    g = _load_entry_module()
    g.dryrun_multichip(16)


def test_dryrun_bootstrap_propagates_failure(devices, monkeypatch):
    g = _load_entry_module()
    real_run = subprocess.run

    def failing_run(*args, **kwargs):
        return subprocess.CompletedProcess(
            args=args, returncode=3, stdout="", stderr="boom"
        )

    monkeypatch.setattr(subprocess, "run", failing_run)
    with pytest.raises(RuntimeError, match="rc=3"):
        g.dryrun_multichip(16)
    monkeypatch.setattr(subprocess, "run", real_run)


def test_entry_compiles(devices):
    import jax

    g = _load_entry_module()
    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (8, 140)

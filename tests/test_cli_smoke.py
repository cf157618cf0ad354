"""Argparse smoke tests: every CLI must expose --help without importing
heavyweight deps at module import time (catches signature drift)."""

import pytest


@pytest.mark.parametrize("module", [
    "extract_embeddings", "train_student", "export_motion_embeddings",
    "tfam_train_eval", "generate_motion", "h5_structure_checker",
    "run_experiments", "benchmark", "extract_frames", "predict",
    "h5_merge", "run_pipeline", "serve", "convert",
])
def test_cli_help(module, capsys):
    import importlib

    cli = importlib.import_module(f"vimoclip_tpu.cli.{module}")
    with pytest.raises(SystemExit) as exc:
        cli.main(["--help"])
    assert exc.value.code == 0
    assert "usage" in capsys.readouterr().out.lower()


def test_enable_compilation_cache(tmp_path, monkeypatch):
    from vimoclip_tpu.utils.jax_setup import enable_compilation_cache

    target = str(tmp_path / "cache")
    monkeypatch.setenv("VIMO_JAX_CACHE_DIR", target)
    assert enable_compilation_cache() == target
    import os
    assert os.path.isdir(target)

    monkeypatch.setenv("VIMO_JAX_CACHE", "0")
    assert enable_compilation_cache() is None


def test_platform_env_pin_reaches_subprocess():
    """VIMO_JAX_PLATFORMS must pin the platform at the CONFIG level in a
    fresh process (the image pins jax_platforms in the jax config, where
    JAX_PLATFORMS alone is silently ignored) — the hook the daemon e2e
    test and any CPU smoke run of a CLI on a TPU host rely on."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, VIMO_JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, "-c",
         "from vimoclip_tpu.utils.jax_setup import enable_compilation_cache;"
         "enable_compilation_cache();"
         "import jax; print('backend=' + jax.default_backend())"],
        env=env, capture_output=True, text=True, timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "backend=cpu" in out.stdout

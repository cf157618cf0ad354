"""Argparse smoke tests: every CLI must expose --help without importing
heavyweight deps at module import time (catches signature drift)."""

import pytest


@pytest.mark.parametrize("module", [
    "extract_embeddings", "train_student", "export_motion_embeddings",
    "tfam_train_eval", "generate_motion", "h5_structure_checker",
    "run_experiments", "benchmark", "extract_frames", "predict",
    "h5_merge",
])
def test_cli_help(module, capsys):
    import importlib

    cli = importlib.import_module(f"vimoclip_tpu.cli.{module}")
    with pytest.raises(SystemExit) as exc:
        cli.main(["--help"])
    assert exc.value.code == 0
    assert "usage" in capsys.readouterr().out.lower()

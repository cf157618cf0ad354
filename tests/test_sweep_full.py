"""Table-2 sweep system tests (VERDICT r2 item 1).

The committed SWEEP.json artifact is produced by ``make sweep``
(tools/run_table2_sweep.py): the full 21-config reference grid
(/root/reference/TFAM/run_experiments.sh:3-23) trained AND evaluated
end-to-end over a synthetic cascade corpus. The always-on test here pins
the artifact's integrity; the full ~6-min re-execution is gated behind
VIMO_SWEEP_TESTS=1 so `make test` stays fast (`make sweep` re-runs it for
real and rewrites the artifact).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_ARTIFACT = os.path.join(_REPO, "SWEEP.json")


def test_sweep_artifact_all_21_configs_ok():
    with open(_ARTIFACT) as f:
        sweep = json.load(f)
    results = sweep["results"]
    assert sweep["configs_total"] == sweep["configs_ok"] == len(results) == 21
    names = [r["config"] for r in results]
    assert names == ["config_default.yaml"] + [
        f"config_{i}.yaml" for i in range(1, 21)
    ]
    for r in results:
        assert r["status"] == "ok", r
        assert np.isfinite(r["best_val_mAP"]) and 0 <= r["best_val_mAP"] <= 1, r
        assert np.isfinite(r["eval_loss"]), r
        assert np.isfinite(r["eval_mAP"]) and 0 <= r["eval_mAP"] <= 1, r
    # Determinism pin: the reference grid contains two exact duplicates
    # (config_1 re-runs config_default, config_20 re-runs config_2,
    # cfg_AK/config_{1,20}.yaml) — a seeded sweep must reproduce them
    # bit-for-bit.
    by = {r["config"]: r for r in results}
    assert by["config_1.yaml"]["best_val_mAP"] == \
        by["config_default.yaml"]["best_val_mAP"]
    assert by["config_20.yaml"]["best_val_mAP"] == \
        by["config_2.yaml"]["best_val_mAP"]


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("VIMO_SWEEP_TESTS") != "1",
    reason="full 21-config sweep takes ~6 min; run via `make sweep` or "
           "VIMO_SWEEP_TESTS=1",
)
def test_table2_sweep_executes_end_to_end(tmp_path):
    out = tmp_path / "SWEEP.json"
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "run_table2_sweep.py"),
         "--out", str(out), "--work-dir", str(tmp_path / "work")],
        capture_output=True, text=True, timeout=3000,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    sweep = json.loads(out.read_text())
    assert sweep["configs_ok"] == sweep["configs_total"] == 21

"""vimo-convert — move trained checkpoints between this framework and the
reference's torch formats, so there is no lock-in in either direction.

Subcommands:
  tfam-to-torch     Orbax stage-2 checkpoint -> reference ``best_model.pth``
                    (TFAM/train_and_eval.py:133-149 layout; the reference
                    eval loads ``checkpoint["state_dict"]``, :187-189)
  student-to-torch  Orbax stage-1 checkpoint -> reference
                    ``student_best.pth`` (train.py:174 saves a bare
                    ``model.state_dict()`` of the OpenAI-CLIP-backed
                    student, models/student_model.py:38-59)

The reverse directions already ship elsewhere: ``vimo-predict``/
``vimo-tfam`` accept ``--tfam-torch-checkpoint``/``--torch-checkpoint``
directly, and ``models.torch_compat.student_params_from_torch`` loads a
reference stage-1 checkpoint into StudentModel params.

torch is imported only at save time (offline tool path, never the TPU hot
loop). ``--module-prefix`` prepends DataParallel's ``module.`` to every
key — the layout reference stage-1 checkpoints carry (inference.py:80-86
strips it), for consumers that load without re-wrapping.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _load_orbax_params(checkpoint_dir: str, name: str) -> tuple[dict, dict]:
    """Standalone Orbax restore (no optimizer template needed): returns
    (params, extra-json sidecar). Layout per train/state.CheckpointManager:
    ``<dir>/<name>`` holds {step, params, opt_state} + ``extra.json``."""
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(checkpoint_dir), name)
    if not os.path.isdir(path):
        available = sorted(
            d for d in os.listdir(checkpoint_dir)
            if os.path.isdir(os.path.join(checkpoint_dir, d))
        ) if os.path.isdir(checkpoint_dir) else []
        raise SystemExit(
            f"no checkpoint '{name}' under {checkpoint_dir} "
            f"(available: {available or 'none'})"
        )
    restored = ocp.StandardCheckpointer().restore(path)
    extra = {}
    extra_path = os.path.join(path, "extra.json")
    if os.path.exists(extra_path):
        with open(extra_path) as f:
            extra = json.load(f)
    return restored["params"], extra


def _count_layers(params: dict) -> int:
    return sum(1 for k in params if str(k).startswith("layers_"))


def _to_tensors(state: dict, module_prefix: bool) -> dict:
    import torch

    prefix = "module." if module_prefix else ""
    # np.array copies: Orbax restores read-only arrays, which torch cannot
    # wrap without a non-writable-tensor warning
    return {
        prefix + k: torch.from_numpy(np.array(v)) for k, v in state.items()
    }


def convert_tfam(checkpoint_dir: str, out: str, name: str = "best",
                 num_layers: int | None = None,
                 module_prefix: bool = False) -> dict:
    """Stage-2 Orbax checkpoint -> reference best_model.pth. Returns the
    saved payload. Sidecar metadata (epoch, best metric) is carried into
    the reference's own extra keys when present; its loader only reads
    ``state_dict`` (train_and_eval.py:189)."""
    import torch

    params, extra = _load_orbax_params(checkpoint_dir, name)
    from vimoclip_tpu.models.torch_compat import tfam_params_to_torch

    n = num_layers or _count_layers(params)
    if n == 0:
        raise SystemExit(
            f"checkpoint under {checkpoint_dir}/{name} has no layers_* "
            "params — is this a stage-2 TFAM checkpoint?"
        )
    state = tfam_params_to_torch(params, num_layers=n,
                                 fill_missing_reference_modules=True)
    payload: dict = {"state_dict": _to_tensors(state, module_prefix)}
    if "epoch" in extra:
        payload["epoch"] = int(extra["epoch"])
    if "best_metric" in extra:
        payload["best_val_mAP"] = float(extra["best_metric"])
    torch.save(payload, out)
    return payload


def convert_student(checkpoint_dir: str, out: str, name: str = "best",
                    module_prefix: bool = False) -> dict:
    """Stage-1 Orbax checkpoint -> reference student_best.pth (a bare
    state dict, train.py:167/174). Vision depth is inferred from the
    checkpoint's ``visual_encoder`` params."""
    import torch

    params, _ = _load_orbax_params(checkpoint_dir, name)
    if "visual_encoder" not in params:
        raise SystemExit(
            f"checkpoint under {checkpoint_dir}/{name} has no "
            "visual_encoder params — is this a stage-1 student checkpoint?"
        )
    from vimoclip_tpu.models.clip_vit import ClipVisionConfig
    from vimoclip_tpu.models.torch_compat import student_params_to_torch

    cfg = ClipVisionConfig(num_layers=_count_layers(params["visual_encoder"]))
    state = student_params_to_torch(params, cfg)
    tensors = _to_tensors(state, module_prefix)
    torch.save(tensors, out)
    return tensors


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    for cmd in ("tfam-to-torch", "student-to-torch"):
        s = sub.add_parser(cmd)
        s.add_argument("--checkpoint-dir", required=True,
                       help="Orbax checkpoint directory (the trainer's "
                            "checkpoint_dir)")
        s.add_argument("--name", default="best",
                       help="checkpoint name under the dir: 'best' or a "
                            "'step_N' (default: best)")
        s.add_argument("--out", required=True, help="output .pth path")
        s.add_argument("--module-prefix", action="store_true",
                       help="prefix every key with DataParallel's "
                            "'module.' (reference stage-1 layout)")
    a = sub.choices["tfam-to-torch"]
    a.add_argument("--num-layers", type=int, default=None,
                   help="override the layer count inferred from params")
    args = p.parse_args(argv)

    if args.cmd == "tfam-to-torch":
        payload = convert_tfam(args.checkpoint_dir, args.out, name=args.name,
                               num_layers=args.num_layers,
                               module_prefix=args.module_prefix)
        n = len(payload["state_dict"])
        print(f"wrote {args.out}: {n} tensors"
              + (f", best_val_mAP={payload['best_val_mAP']:.4f}"
                 if "best_val_mAP" in payload else ""))
    else:
        tensors = convert_student(args.checkpoint_dir, args.out,
                                  name=args.name,
                                  module_prefix=args.module_prefix)
        print(f"wrote {args.out}: {len(tensors)} tensors")
    return 0


if __name__ == "__main__":
    sys.exit(main())

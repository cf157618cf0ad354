"""One-command three-stage pipeline orchestration.

The reference ships the cascade as five separate scripts the user chains by
hand through ad-hoc paths (README.md recipe: extract_embeddings.py ->
generate_*_videos.py -> train*.py -> inference*.py ->
TFAM/train_and_eval*.py). ``run_pipeline`` drives the same chain through
this package's CLI surfaces with a fixed artifact layout under one
``workdir`` and idempotent stage skipping: a stage whose artifact already
exists is skipped (crash anywhere -> rerun the same command -> only the
missing stages run; combine with the trainers' own ``--resume`` for
mid-stage recovery). ``vimo-pipeline`` is the CLI front end.

Artifact layout under ``workdir``:

    rgb_train.h5, rgb_val.h5     stage-0 teacher embeddings
    motion_videos/               generated motion modality (+ .done marker)
    student_ckpt/                stage-1 checkpoints ('best' = artifact)
    motion.h5                    stage-1 exported motion embeddings
    tfam_config.yaml             stage-2 config with data paths injected
    tfam/                        stage-2 run dir (logs/checkpoints/results)
"""

from __future__ import annotations

import dataclasses
import logging
import os

import yaml


@dataclasses.dataclass
class PipelineConfig:
    workdir: str
    data_root: str
    train_annotations: str
    val_annotations: str
    class_file: str
    clip_weights: str
    tfam_config: str
    motion_kind: str = "frame_diff"  # frame_diff | flow
    flow_backend: str = "farneback"
    flow_weights: str | None = None
    num_classes: int = 140
    extract_batch: int = 256
    student_epochs: int = 10
    student_batch: int = 8
    sequence_length: int = 30
    num_workers: int = 4
    half_precision: bool = True
    data_parallel: int = -1  # stage-1 mesh (-1 = all devices)
    model_parallel: int = 1
    force: bool = False  # rerun stages even when artifacts exist


def _exists(path: str) -> bool:
    return os.path.exists(path)


def _skip(cfg: PipelineConfig, artifact: str, stage: str) -> bool:
    if not cfg.force and _exists(artifact):
        logging.info("[pipeline] %s: artifact %s exists — skipping",
                     stage, artifact)
        return True
    logging.info("[pipeline] %s -> %s", stage, artifact)
    return False


def run_pipeline(cfg: PipelineConfig) -> dict:
    """Run (or resume) the full cascade; returns artifact paths."""
    os.makedirs(cfg.workdir, exist_ok=True)
    w = lambda name: os.path.join(cfg.workdir, name)
    float32 = ["--float32"] if not cfg.half_precision else []

    # stage 0: teacher extraction (train + val splits)
    from vimoclip_tpu.cli.extract_embeddings import main as extract_main

    common = [
        "--data-root", cfg.data_root, "--class-file", cfg.class_file,
        "--clip-weights", cfg.clip_weights,
        "--batch-size", str(cfg.extract_batch),
    ] + float32
    rgb_train = w("rgb_train.h5")
    if not _skip(cfg, rgb_train, "extract[train]"):
        extract_main(["--annotation-file", cfg.train_annotations,
                      "--output", rgb_train, "--split", "train"] + common)
    rgb_val = w("rgb_val.h5")
    if not _skip(cfg, rgb_val, "extract[val]"):
        extract_main(["--annotation-file", cfg.val_annotations,
                      "--output", rgb_val, "--split", "val"] + common)

    # stage 0b: motion-modality videos for every annotated video
    from vimoclip_tpu.cli.generate_motion import main as motion_main
    from vimoclip_tpu.extraction import load_annotations

    motion_dir = w("motion_videos")
    done = os.path.join(motion_dir, ".done")
    if not _skip(cfg, done, "generate-motion"):
        names: list[str] = []
        seen = set()
        for ann in (cfg.train_annotations, cfg.val_annotations):
            for name, _ in load_annotations(ann):
                if name not in seen:
                    seen.add(name)
                    names.append(name)
        list_file = w("video_list.txt")
        with open(list_file, "w") as f:
            f.write("\n".join(names))
        args = ["--list-file", list_file, "--input-dir", cfg.data_root,
                "--output-dir", motion_dir, "--kind", cfg.motion_kind]
        if cfg.motion_kind == "flow":
            args += ["--flow-backend", cfg.flow_backend]
            if cfg.flow_weights:
                args += ["--flow-weights", cfg.flow_weights]
        motion_main(args)
        with open(done, "w"):
            pass

    # stage 1: student distillation
    from vimoclip_tpu.cli.train_student import main as train_main

    student_ckpt = w("student_ckpt")
    if not _skip(cfg, os.path.join(student_ckpt, "best"), "train-student"):
        train_main([
            "--train-embeddings", rgb_train, "--val-embeddings", rgb_val,
            "--motion-videos-dir", motion_dir,
            "--checkpoint-dir", student_ckpt, "--log-dir", w("student_logs"),
            "--clip-weights", cfg.clip_weights,
            "--epochs", str(cfg.student_epochs),
            "--batch-size", str(cfg.student_batch),
            "--num-workers", str(cfg.num_workers),
            "--sequence-length", str(cfg.sequence_length),
            "--num-classes", str(cfg.num_classes), "--resume",
            "--data-parallel", str(cfg.data_parallel),
            "--model-parallel", str(cfg.model_parallel),
        ] + float32)

    # stage 1b: motion-embedding export
    from vimoclip_tpu.cli.export_motion_embeddings import main as export_main

    motion_h5 = w("motion.h5")
    if not _skip(cfg, motion_h5, "export-motion"):
        export_main([
            "--videos-dir", motion_dir, "--output", motion_h5,
            "--checkpoint-dir", student_ckpt,
            "--clip-weights", cfg.clip_weights,
            "--num-classes", str(cfg.num_classes),
        ] + float32)

    # consistency gate (the reference's de-facto integration check,
    # h5_structure_checker): train/val teacher extractions share a schema
    from vimoclip_tpu.cli.h5_structure_checker import main as checker_main

    if checker_main([rgb_train, rgb_val]) != 0:
        raise RuntimeError("train/val teacher HDF5 schemas diverge")

    # stage 2: TFAM train + eval with data paths injected into the user's
    # stage-2 config
    from vimoclip_tpu.cli.tfam_train_eval import main as tfam_main

    with open(cfg.tfam_config) as f:
        tfam_cfg = yaml.safe_load(f) or {}
    data = tfam_cfg.setdefault("data", {})
    data["train_dataset_path"] = rgb_train
    data["val_dataset_path"] = rgb_val
    data["flow_dataset_path"] = motion_h5
    data.setdefault("class_names_dir", cfg.class_file)
    data.setdefault("num_classes", cfg.num_classes)
    injected = w("tfam_config.yaml")
    with open(injected, "w") as f:
        yaml.safe_dump(tfam_cfg, f)
    rundir = w("tfam")
    # the stage-2 artifact is a written results JSON (a crash-left empty
    # run dir must NOT count as done)
    import glob as _glob

    existing = _glob.glob(os.path.join(rundir, "results", "results_*.json"))
    if cfg.force or not existing:
        logging.info("[pipeline] tfam-train-eval -> %s", rundir)
        cwd = os.getcwd()
        os.makedirs(rundir, exist_ok=True)
        try:
            os.chdir(rundir)  # run dirs + results land here
            tfam_main(["--config", injected, "--run-name", "pipeline"])
        finally:
            os.chdir(cwd)
    else:
        logging.info("[pipeline] tfam-train-eval: %s exists — skipping",
                     existing[-1])

    return {
        "rgb_train": rgb_train, "rgb_val": rgb_val,
        "motion_videos": motion_dir, "student_ckpt": student_ckpt,
        "motion_embeddings": motion_h5, "tfam_config": injected,
        "tfam_rundir": rundir,
    }

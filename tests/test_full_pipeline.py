"""Full-cascade integration tests on synthetic data — the complete reference
workflow (SURVEY.md §1 L0->L6) through this framework's real public
surfaces, on the 8-device CPU mesh:

  1. synthetic RGB video corpus + annotations
  2. teacher extraction  -> rgb h5           (extraction.create_hdf5_dataset)
  3. frame-diff videos                       (motion.process_video_list)
  4. student distillation, 1 epoch           (StudentTrainer)
  5. motion-embedding export -> motion h5    (MotionEmbeddingExporter)
  6. structure check rgb vs motion h5        (compare_structures)
  7. TFAM train + eval over the two h5 files (TFAMTrainer/TFAMTester)
  8. serving predictor on a raw video with the trained params

The corpus carries a REAL class signal (class k = a flickering bright block
in quadrant k, visible to both the RGB teacher and the frame-diff student),
so the cascade must LEARN: val micro-mAP must end comfortably above the
chance level and above its first epoch — a sign-flipped loss, a broken
label path, or a dead optimizer anywhere in the chain fails this (the
closable stand-in for the reference's 77.09 AK headline,
TFAM/train_and_eval.py:41-173). A second test drives the same cascade
through the actual argparse CLI entry points.
"""

import json
import os

import h5py
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vimoclip_tpu.config import (
    DataConfig,
    ExperimentConfig,
    LoggingConfig,
    TFAMModelConfig,
    TrainingConfig,
)
from vimoclip_tpu.data.hdf5_schema import analyze_structure
from vimoclip_tpu.data.segment_dataset import SegmentDataset
from vimoclip_tpu.data.video_reader import write_video
from vimoclip_tpu.export import MotionEmbeddingExporter, find_motion_videos
from vimoclip_tpu.extraction import create_hdf5_dataset
from vimoclip_tpu.models.clip_vit import ClipVisionConfig, ClipVisionEncoder
from vimoclip_tpu.motion import process_video_list
from vimoclip_tpu.serving import ViMoCLIPPredictor
from vimoclip_tpu.train.student_trainer import StudentTrainer
from vimoclip_tpu.train.tfam_trainer import TFAMTester, TFAMTrainer

VCFG = ClipVisionConfig(
    image_size=32, patch_size=8, hidden_size=32, num_layers=1,
    num_heads=2, intermediate_size=64, projection_dim=24,
)
C = 4
N_VIDEOS = 8
# single-label multi-hot over C=4 -> micro-mAP chance level = positive rate
CHANCE_MAP = 1.0 / C


# class -> global color cast: red / green / blue / white
_PALETTE = np.array(
    [[200, 30, 30], [30, 200, 30], [30, 30, 200], [190, 190, 190]], np.float32
)


def _make_corpus(root, rng):
    """N_VIDEOS tiny videos where class k = a flickering GLOBAL color cast
    over per-frame noise. Global casts shift every patch embedding in a
    class-specific direction, so the signal survives a random-init ViT's
    CLS-token mixing (a spatial-pattern signal measurably does not); the
    even/odd-frame gain flicker makes consecutive-frame diffs carry a
    class-specific luma magnitude, so the motion path sees it too."""
    names = []
    for i in range(N_VIDEOS):
        k = i % C
        t = int(rng.integers(8, 13))
        noise = rng.integers(0, 256, (t, 36, 48, 3)).astype(np.float32)
        gain = np.where(np.arange(t) % 2 == 0, 1.0, 0.55)[:, None, None, None]
        video = np.clip(0.25 * noise + _PALETTE[k] * gain, 0, 255).astype(np.uint8)
        write_video(str(root / f"v{i}.mp4"), video)
        names.append(f"v{i}.mp4")
    (root / "train.txt").write_text(
        "\n".join(f"{n} {i % C}" for i, n in enumerate(names))
    )
    (root / "classes.csv").write_text(
        "id,name\n" + "\n".join(f"{i},cls{i}" for i in range(C))
    )
    return names


def _tfam_config(rgb_h5, motion_h5, epochs=10, lr=3e-3):
    return ExperimentConfig(
        training=TrainingConfig(epochs=epochs, batch_size=4, num_workers=2,
                                lr=lr, seed=49),
        logging=LoggingConfig(),
        data=DataConfig(num_classes=C, train_dataset_path=rgb_h5,
                        val_dataset_path=rgb_h5, flow_dataset_path=motion_h5,
                        length_bucket=8),
        model=TFAMModelConfig(d_model=24, nhead=2, num_layers=1,
                              dim_feedforward=48, dropout=0.0, mlp_dropout=0.0),
    )


@pytest.mark.slow
def test_full_cascade(tmp_path, mesh8):
    rng = np.random.default_rng(0)
    root = tmp_path / "videos"
    root.mkdir()

    # 1. corpus: each class gets a characteristic brightness/motion pattern
    names = _make_corpus(root, rng)

    # 2. teacher extraction
    teacher_params = ClipVisionEncoder(VCFG).init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3))
    )["params"]
    rgb_h5 = str(tmp_path / "rgb.h5")
    errors = create_hdf5_dataset(
        data_root=str(root), annotation_file=str(root / "train.txt"),
        class_file=str(root / "classes.csv"), output_hdf5=rgb_h5,
        params=teacher_params, config=VCFG, batch_size=16, split="train",
    )
    assert errors == {}

    # 3. frame-diff motion videos
    diff_dir = str(tmp_path / "diffs")
    lst = root / "list.txt"
    lst.write_text("\n".join(names))
    errors = process_video_list(str(lst), str(root), diff_dir, kind="frame_diff")
    assert errors == {}

    # 4. student distillation (1 epoch, CLIP-initialised from the teacher)
    seg = SegmentDataset(rgb_h5, diff_dir, sequence_length=5)
    student = StudentTrainer(
        seg, seg, checkpoint_dir=str(tmp_path / "student_ckpt"),
        vision_config=VCFG, pretrained_params=teacher_params,
        num_classes=C, lr=1e-4, batch_size=4, num_workers=2, epochs=1,
        half_precision=False, mesh=mesh8,
    )
    student.train()

    # 5. motion-embedding export with the trained student
    motion_h5 = str(tmp_path / "motion.h5")
    host_params = jax.device_get(student.state.params)
    exporter = MotionEmbeddingExporter(
        host_params, VCFG, chunk_size=8, half_precision=False,
    )
    counts = exporter.export(find_motion_videos(diff_dir), motion_h5)
    assert counts["processed"] == N_VIDEOS and counts["errors"] == 0

    # 6. stage contract: every rgb key has a motion partner and structures
    # are internally consistent
    a = analyze_structure(rgb_h5)
    b = analyze_structure(motion_h5)
    assert a["all_groups_same_structure"] and b["all_groups_same_structure"]
    assert a["num_groups"] == b["num_groups"] == N_VIDEOS

    # 7. TFAM train + eval over the produced files — the cascade must LEARN
    config = _tfam_config(rgb_h5, motion_h5)
    trainer = TFAMTrainer(
        config, log_dir=str(tmp_path / "logs"),
        checkpoint_dir=str(tmp_path / "tfam_ckpt"), mesh=mesh8,
    )
    trainer.train()
    maps = [h["val_map"] for h in trainer.history]
    assert max(maps) > maps[0], f"val mAP never rose: {maps}"
    tester = TFAMTester(trainer, results_dir=str(tmp_path / "results"))
    tester.load_best()
    results = tester.evaluate(save_predictions=True)
    final_map = results["metrics"]["mAP"]
    assert final_map >= 3 * CHANCE_MAP, (
        f"cascade failed to learn: best-checkpoint val mAP {final_map:.3f} "
        f"vs chance {CHANCE_MAP} (trajectory {maps})"
    )
    assert len(results["videos"]) == N_VIDEOS

    # 8. serving: raw video -> prediction using ALL trained params
    predictor = ViMoCLIPPredictor(
        teacher_params=teacher_params, teacher_config=VCFG,
        student_params=host_params, student_config=VCFG,
        tfam_params=jax.device_get(trainer.state.params),
        tfam_config=config.model, num_classes=C,
        frame_batch=16, length_bucket=8, half_precision=False,
    )
    pred = predictor.predict(str(root / "v0.mp4"), top_k=2)
    assert len(pred.top_classes) == 2
    assert np.all(np.isfinite(pred.probabilities))


@pytest.mark.slow
def test_full_cascade_through_clis(tmp_path, monkeypatch, mesh8):
    """The same L0->L6 cascade, driven end to end through the actual CLI
    entry points (the surfaces a reference user calls): extract-embeddings
    -> generate-motion -> train-student -> export-motion-embeddings ->
    h5-structure-checker -> tfam-train-eval, asserting the final results
    JSON shows above-chance mAP."""
    import torch
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModelWithProjection

    from vimoclip_tpu.cli.export_motion_embeddings import main as export_main
    from vimoclip_tpu.cli.extract_embeddings import main as extract_main
    from vimoclip_tpu.cli.generate_motion import main as motion_main
    from vimoclip_tpu.cli.h5_structure_checker import main as checker_main
    from vimoclip_tpu.cli.tfam_train_eval import main as tfam_main

    monkeypatch.chdir(tmp_path)  # run dirs + results land in tmp
    rng = np.random.default_rng(1)
    root = tmp_path / "videos"
    root.mkdir()
    names = _make_corpus(root, rng)
    (root / "list.txt").write_text("\n".join(names))

    # tiny HF CLIP checkpoint on disk (zero-egress: random-init from config)
    torch.manual_seed(0)
    hf = CLIPVisionModelWithProjection(HFConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=2, image_size=32, patch_size=8,
        projection_dim=24))
    clip_ckpt = str(tmp_path / "clip.pt")
    torch.save(hf.state_dict(), clip_ckpt)

    common = ["--data-root", str(root),
              "--annotation-file", str(root / "train.txt"),
              "--class-file", str(root / "classes.csv"),
              "--clip-weights", clip_ckpt, "--batch-size", "16", "--float32"]
    rgb_h5 = str(tmp_path / "rgb_train.h5")
    extract_main(["--output", rgb_h5, "--split", "train"] + common)
    rgb_val_h5 = str(tmp_path / "rgb_val.h5")
    extract_main(["--output", rgb_val_h5, "--split", "val"] + common)

    diff_dir = str(tmp_path / "diffs")
    motion_main(["--list-file", str(root / "list.txt"),
                 "--input-dir", str(root), "--output-dir", diff_dir,
                 "--kind", "frame_diff"])

    ckpt_dir = str(tmp_path / "student_ckpt")
    from vimoclip_tpu.cli.train_student import main as train_main
    train_main([
        "--train-embeddings", rgb_h5, "--val-embeddings", rgb_h5,
        "--motion-videos-dir", diff_dir,
        "--checkpoint-dir", ckpt_dir, "--log-dir", str(tmp_path / "slogs"),
        "--clip-weights", clip_ckpt,
        "--epochs", "1", "--batch-size", "4", "--num-workers", "2",
        "--sequence-length", "5", "--num-classes", str(C), "--float32",
        "--data-parallel", "2", "--model-parallel", "1",
    ])
    assert os.path.isdir(os.path.join(ckpt_dir, "best"))

    motion_h5 = str(tmp_path / "motion.h5")
    export_main([
        "--videos-dir", diff_dir, "--output", motion_h5,
        "--checkpoint-dir", ckpt_dir, "--clip-weights", clip_ckpt,
        "--chunk-size", "8", "--float32", "--num-classes", str(C),
    ])

    # the opt-in int8 exporter path restores the same checkpoint (identical
    # param tree) and lands near the float embeddings
    motion_int8_h5 = str(tmp_path / "motion_int8.h5")
    export_main([
        "--videos-dir", diff_dir, "--output", motion_int8_h5,
        "--checkpoint-dir", ckpt_dir, "--clip-weights", clip_ckpt,
        "--chunk-size", "8", "--float32", "--num-classes", str(C),
        "--quantize", "int8",
    ])
    with h5py.File(motion_h5, "r") as ff, h5py.File(motion_int8_h5, "r") as fq:
        key = next(iter(ff.keys()))
        a = np.asarray(ff[key]["embeddings"][:], np.float64)
        b = np.asarray(fq[key]["embeddings"][:], np.float64)
        cos = (a * b).sum(-1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
        )
        assert np.all(cos > 0.98), cos.min()

    # structure checker: the two teacher extractions share one schema
    assert checker_main([rgb_h5, rgb_val_h5]) == 0

    cfg = tmp_path / "config_cascade.yaml"
    cfg.write_text(f"""
training:
  mode: both
  seed: 49
  lr: 3e-3
  epochs: 10
  batch_size: 4
  num_workers: 2
  data_parallel: 2
  model_parallel: 1
logging:
  log_dir: logs
  checkpoint_dir: checkpoints
data:
  num_classes: {C}
  class_names_dir: {root / 'classes.csv'}
  train_dataset_path: {rgb_h5}
  val_dataset_path: {rgb_h5}
  flow_dataset_path: {motion_h5}
  length_bucket: 8
model:
  d_model: 24
  nhead: 2
  num_layers: 1
  dim_feedforward: 48
  dropout: 0.0
  mlp_dropout: 0.0
""")
    tfam_main(["--config", str(cfg), "--run-name", "cascade"])

    results_dir = tmp_path / "results"
    files = sorted(results_dir.glob("results_*.json"))
    assert files, "tfam_train_eval wrote no results JSON"
    with open(files[-1]) as f:
        results = json.load(f)
    final_map = results["metrics"]["mAP"]
    assert final_map >= 3 * CHANCE_MAP, (
        f"CLI cascade failed to learn: mAP {final_map:.3f} vs chance "
        f"{CHANCE_MAP}"
    )
    # per-video top-5 records carry resolved class names from classes.csv
    assert results["videos"][0]["predictions"]
    some_name = next(iter(results["videos"][0]["predictions"].values()))
    assert some_name["class_name"].startswith("cls")

    # --- final leg: vimo-predict serves a raw video with the artifacts the
    # cascade just trained (teacher weights file + student 'best' + TFAM
    # 'best') — the complete user journey ends at a prediction ---
    from vimoclip_tpu.cli.predict import main as predict_main

    best_dirs = sorted(tmp_path.glob("**/checkpoints/**/best"))
    assert best_dirs, "tfam run left no best checkpoint"
    tfam_ckpt_dir = str(best_dirs[-1].parent)
    preds_json = str(tmp_path / "serve_preds.json")
    predict_main([
        str(root / names[0]),
        "--teacher-weights", clip_ckpt,
        "--student-checkpoint-dir", ckpt_dir,
        "--student-clip-weights", clip_ckpt,
        "--tfam-config", str(cfg),
        "--tfam-checkpoint-dir", tfam_ckpt_dir,
        "--top-k", str(C), "--output", preds_json,
        "--frame-batch", "8", "--float32",
    ])
    served = json.load(open(preds_json))
    probs = [p["probability"] for p in served[0]["predictions"]]
    assert len(probs) == C and all(0.0 <= p <= 1.0 for p in probs)
    assert served[0]["predictions"][0]["class_name"].startswith("cls")

    # the same artifacts through the opt-in quantized towers (--quantize
    # int8 threads matmul_quant into both ViT configs)
    q_json = str(tmp_path / "serve_preds_int8.json")
    predict_main([
        str(root / names[0]),
        "--teacher-weights", clip_ckpt,
        "--student-checkpoint-dir", ckpt_dir,
        "--student-clip-weights", clip_ckpt,
        "--tfam-config", str(cfg),
        "--tfam-checkpoint-dir", tfam_ckpt_dir,
        "--top-k", str(C), "--output", q_json,
        "--frame-batch", "8", "--float32", "--quantize", "int8",
    ])
    q_served = json.load(open(q_json))
    q_probs = [p["probability"] for p in q_served[0]["predictions"]]
    assert len(q_probs) == C and all(0.0 <= p <= 1.0 for p in q_probs)

    # --- beyond-reference leg: the SAME artifacts behind the vimo-serve
    # daemon (real subprocess, real HTTP): --warmup pre-compiles on the
    # probe video, concurrent POSTs coalesce through dynamic batching
    # (/stats proves one pooled device call), and each response matches
    # the one-shot vimo-predict output for that video ---
    import socket
    import subprocess
    import sys as _sys
    import threading
    import time as _time
    import urllib.request

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    import os as _os

    denv = dict(_os.environ,
                VIMO_JAX_PLATFORMS="cpu",  # config-level pin (jax_setup)
                XLA_FLAGS="--xla_force_host_platform_device_count=1")
    daemon = subprocess.Popen([
        _sys.executable, "-m", "vimoclip_tpu.cli.serve",
        "--teacher-weights", clip_ckpt,
        "--student-checkpoint-dir", ckpt_dir,
        "--student-clip-weights", clip_ckpt,
        "--tfam-config", str(cfg),
        "--tfam-checkpoint-dir", tfam_ckpt_dir,
        "--frame-batch", "8", "--float32",
        "--port", str(port), "--max-batch", "4", "--batch-wait-ms", "5000",
        "--warmup", "--probe-video", str(root / names[0]),
    ], env=denv)
    try:
        base = f"http://127.0.0.1:{port}"
        deadline = _time.monotonic() + 300
        while True:  # wait for weights + warmup compile
            assert daemon.poll() is None, "vimo-serve died during startup"
            try:
                with urllib.request.urlopen(f"{base}/healthz", timeout=5):
                    break
            except OSError:
                assert _time.monotonic() < deadline, "daemon never came up"
                _time.sleep(1.0)

        responses = [None, None]

        def post(i, video):
            body = json.dumps({"video": video, "top_k": C}).encode()
            req = urllib.request.Request(
                f"{base}/predict", data=body,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=300) as r:
                responses[i] = json.load(r)

        posters = [
            threading.Thread(target=post, args=(i, str(root / names[i])))
            for i in range(2)
        ]
        for t in posters:
            t.start()
        for t in posters:
            t.join(timeout=300)
        assert all(r is not None for r in responses)
        # request 0 is the same video vimo-predict just served: identical
        # record (the daemon route changes nothing about the numerics)
        assert responses[0] == served[0]
        with urllib.request.urlopen(f"{base}/stats", timeout=30) as r:
            stats = json.load(r)
        assert stats["requests"] == 2
        # the 5s batch window makes coalescing deterministic: both
        # in-flight requests shared ONE pooled device call
        assert stats["predictor_calls"] == 1
        assert stats["max_coalesced"] == 2
    finally:
        daemon.terminate()
        daemon.wait(timeout=30)


@pytest.mark.slow
def test_vimo_pipeline_orchestrator(tmp_path, monkeypatch, mesh8):
    """vimo-pipeline runs the whole cascade from ONE command with a fixed
    workdir layout, learns above chance, and a second identical invocation
    skips every stage (idempotent crash-resume semantics). Runs with a
    RELATIVE --workdir — stage 2 chdirs into its run dir, so the pipeline
    must abspath everything first."""
    import torch
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModelWithProjection

    from vimoclip_tpu.cli.run_pipeline import main as pipeline_main

    rng = np.random.default_rng(3)
    root = tmp_path / "videos"
    root.mkdir()
    _make_corpus(root, rng)

    torch.manual_seed(0)
    hf = CLIPVisionModelWithProjection(HFConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=2, image_size=32, patch_size=8,
        projection_dim=24))
    clip_ckpt = str(tmp_path / "clip.pt")
    torch.save(hf.state_dict(), clip_ckpt)

    tfam_yaml = tmp_path / "tfam.yaml"
    tfam_yaml.write_text(f"""
training:
  mode: both
  seed: 49
  lr: 3e-3
  epochs: 8
  batch_size: 4
  num_workers: 2
  data_parallel: 2
  model_parallel: 1
model:
  d_model: 24
  nhead: 2
  num_layers: 1
  dim_feedforward: 48
  dropout: 0.0
  mlp_dropout: 0.0
data:
  length_bucket: 8
""")

    monkeypatch.chdir(tmp_path)
    workdir = "run"  # relative on purpose (abspath'd by the pipeline)
    args = [
        "--workdir", workdir, "--data-root", str(root),
        "--train-annotations", str(root / "train.txt"),
        "--val-annotations", str(root / "train.txt"),
        "--class-file", str(root / "classes.csv"),
        "--clip-weights", clip_ckpt, "--tfam-config", str(tfam_yaml),
        "--num-classes", str(C), "--extract-batch", "16",
        "--student-epochs", "1", "--student-batch", "4",
        "--sequence-length", "5", "--num-workers", "2", "--float32",
        "--data-parallel", "2", "--model-parallel", "1",
    ]
    pipeline_main(args)

    # artifacts in the documented layout (incl. per-stage done markers)
    for name in ("rgb_train.h5", "rgb_val.h5", "motion.h5",
                 os.path.join("tfam", "pipeline.yaml"),
                 ".extract_train.done", ".train_student.done", ".tfam.done"):
        assert os.path.exists(os.path.join(workdir, name)), name
    assert os.path.isdir(os.path.join(workdir, "student_ckpt", "best"))
    results = sorted(
        (tmp_path / "run" / "tfam").glob("results/results_*.json")
    )
    assert results, "pipeline wrote no stage-2 results"
    with open(results[-1]) as f:
        final = json.load(f)
    assert final["metrics"]["mAP"] >= 3 * CHANCE_MAP, final["metrics"]

    # second invocation: every stage skipped — artifacts untouched, no new
    # stage-2 results written (setup_logging(force=True) detaches caplog,
    # so assert on filesystem effects rather than log lines)
    watched = [
        os.path.join(workdir, "rgb_train.h5"),
        os.path.join(workdir, "rgb_val.h5"),
        os.path.join(workdir, "motion.h5"),
    ]
    mtimes = {p: os.path.getmtime(p) for p in watched}
    n_results = len(results)
    pipeline_main(args)
    for p in watched:
        assert os.path.getmtime(p) == mtimes[p], f"{p} was rewritten"
    results_after = sorted(
        (tmp_path / "run" / "tfam").glob("results/results_*.json")
    )
    assert len(results_after) == n_results, "stage 2 re-ran on resume"


@pytest.mark.slow
def test_vimo_pipeline_mammalnet_variant(tmp_path, monkeypatch, mesh8):
    """The MN family end to end through the orchestrator: nested
    trimmed_videos/ corpus, CE-loss stage-1, CE/accuracy stage-2 — and the
    recursive motion-video discovery that nesting requires
    (reference inference_frame_diff.py:84-86)."""
    import torch
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModelWithProjection

    from vimoclip_tpu.cli.run_pipeline import main as pipeline_main

    rng = np.random.default_rng(9)
    root = tmp_path / "mn"
    (root / "trimmed_videos").mkdir(parents=True)
    names = []
    for i in range(N_VIDEOS):
        k = i % C
        t = int(rng.integers(8, 13))
        noise = rng.integers(0, 256, (t, 36, 48, 3)).astype(np.float32)
        gain = np.where(np.arange(t) % 2 == 0, 1.0, 0.55)[:, None, None, None]
        video = np.clip(0.25 * noise + _PALETTE[k] * gain, 0, 255).astype(np.uint8)
        name = f"trimmed_videos/m{i}.mp4"
        write_video(str(root / name), video)
        names.append(name)
    (root / "train.txt").write_text(
        "\n".join(f"{n} {i % C}" for i, n in enumerate(names))
    )
    (root / "classes.csv").write_text(
        "id,name\n" + "\n".join(f"{i},mn{i}" for i in range(C))
    )

    torch.manual_seed(4)
    hf = CLIPVisionModelWithProjection(HFConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=2, image_size=32, patch_size=8,
        projection_dim=24))
    clip_ckpt = str(tmp_path / "clip_mn.pt")
    torch.save(hf.state_dict(), clip_ckpt)

    tfam_yaml = tmp_path / "tfam_mn.yaml"
    tfam_yaml.write_text(f"""
training:
  mode: both
  seed: 49
  lr: 3e-3
  epochs: 8
  batch_size: 4
  num_workers: 2
  data_parallel: 2
  model_parallel: 1
  loss: ce
  metric: accuracy
model:
  d_model: 24
  nhead: 2
  num_layers: 1
  dim_feedforward: 48
  dropout: 0.0
  mlp_dropout: 0.0
data:
  length_bucket: 8
""")

    workdir = str(tmp_path / "mnrun")
    pipeline_main([
        "--workdir", workdir, "--data-root", str(root),
        "--train-annotations", str(root / "train.txt"),
        "--val-annotations", str(root / "train.txt"),
        "--class-file", str(root / "classes.csv"),
        "--clip-weights", clip_ckpt, "--tfam-config", str(tfam_yaml),
        "--dataset", "mammalnet",
        "--num-classes", str(C), "--extract-batch", "16",
        "--student-epochs", "1", "--student-batch", "4",
        "--sequence-length", "5", "--num-workers", "2", "--float32",
        "--data-parallel", "2", "--model-parallel", "1",
    ])

    import h5py

    with h5py.File(os.path.join(workdir, "motion.h5"), "r") as f:
        assert len(list(f.keys())) >= N_VIDEOS  # recursive discovery worked
    results = sorted(
        (tmp_path / "mnrun" / "tfam").glob("results/results_*.json")
    )
    assert results
    with open(results[-1]) as f:
        final = json.load(f)
    # CE/accuracy variant: metric is top-1 accuracy, chance = 1/C — and it
    # must be PUBLISHED as "accuracy", not mislabeled "mAP" (reference names
    # the metric per variant, train_and_eval_frame_diff_MN.py:49,88).
    assert "mAP" not in final["metrics"], final["metrics"]
    assert final["metrics"]["accuracy"] >= 2 * CHANCE_MAP, final["metrics"]

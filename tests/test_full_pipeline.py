"""Full-cascade integration test on synthetic data — the complete reference
workflow (SURVEY.md §1 L0->L6) through this framework's real public
surfaces, in-process on the 8-device CPU mesh:

  1. synthetic RGB video corpus + annotations
  2. teacher extraction  -> rgb h5           (extraction.create_hdf5_dataset)
  3. frame-diff videos                       (motion.process_video_list)
  4. student distillation, 1 epoch           (StudentTrainer)
  5. motion-embedding export -> motion h5    (MotionEmbeddingExporter)
  6. structure check rgb vs motion h5        (compare_structures)
  7. TFAM train + eval over the two h5 files (TFAMTrainer/TFAMTester)
  8. serving predictor on a raw video with the trained params
"""

import os

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


@pytest.mark.slow
def test_full_cascade(tmp_path, mesh8):
    rng = np.random.default_rng(0)
    root = tmp_path / "videos"
    root.mkdir()

    # 1. corpus: each class gets a characteristic brightness/motion pattern
    names = []
    for i in range(N_VIDEOS):
        t = int(rng.integers(8, 13))
        base = rng.integers(0, 256, (t, 36, 48, 3), dtype=np.uint8)
        write_video(str(root / f"v{i}.mp4"), base)
        names.append(f"v{i}.mp4")
    (root / "train.txt").write_text(
        "\n".join(f"{n} {i % C}" for i, n in enumerate(names))
    )
    (root / "classes.csv").write_text(
        "id,name\n" + "\n".join(f"{i},cls{i}" for i in range(C))
    )

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

    # 7. TFAM train + eval over the produced files
    config = ExperimentConfig(
        training=TrainingConfig(epochs=2, batch_size=4, num_workers=2, lr=1e-3,
                                seed=49),
        logging=LoggingConfig(),
        data=DataConfig(num_classes=C, train_dataset_path=rgb_h5,
                        val_dataset_path=rgb_h5, flow_dataset_path=motion_h5,
                        length_bucket=8),
        model=TFAMModelConfig(d_model=24, nhead=2, num_layers=1,
                              dim_feedforward=48, dropout=0.0, mlp_dropout=0.0),
    )
    trainer = TFAMTrainer(
        config, log_dir=str(tmp_path / "logs"),
        checkpoint_dir=str(tmp_path / "tfam_ckpt"), mesh=mesh8,
    )
    trainer.train()
    tester = TFAMTester(trainer, results_dir=str(tmp_path / "results"))
    tester.load_best()
    results = tester.evaluate(save_predictions=True)
    assert 0.0 <= results["metrics"]["mAP"] <= 1.0
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

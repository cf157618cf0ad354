"""Format validation of the SHIPPED annotation split files against the
pipeline parsers — the real corpora metadata the CLIs run on (reference
dataset/annotations/, SURVEY.md §2 #26).

Round-1 gap: only the class CSVs shipped; without splits no CLI could run
against the real datasets (VERDICT.md missing #2).
"""

import os

import numpy as np
import pytest

from vimoclip_tpu.extraction import load_annotations, load_class_map, multi_hot

ANN_DIR = os.path.join(os.path.dirname(__file__), "..", "dataset", "annotations")


def _path(name):
    return os.path.join(ANN_DIR, name)


@pytest.fixture(scope="module")
def ak_classes():
    return load_class_map(_path("ak_action.csv"))


@pytest.fixture(scope="module")
def mn_classes():
    return load_class_map(_path("mn_action.csv"))


def test_class_maps(ak_classes, mn_classes):
    assert len(ak_classes) == 140
    assert sorted(ak_classes) == list(range(140))
    assert len(mn_classes) == 12
    assert sorted(mn_classes) == list(range(12))


@pytest.mark.parametrize(
    "fname,n_rows",
    [("train_multi.txt", 24004), ("val_multi.txt", 6096)],
)
def test_ak_splits_parse_and_validate(fname, n_rows, ak_classes):
    ann = load_annotations(_path(fname))
    assert len(ann) == n_rows
    seen = set()
    for vid, labels in ann:
        assert vid.endswith(".mp4"), vid
        assert vid not in seen, f"duplicate id {vid}"
        seen.add(vid)
        assert labels, f"{vid} has no labels"  # multi-label: >=1
        assert all(0 <= l < 140 for l in labels), (vid, labels)
    # multi-hot conversion emits no out-of-range warnings on real data
    mh = multi_hot(ann[0][1], 140)
    assert mh.shape == (140,) and mh.sum() == len(set(ann[0][1]))


@pytest.mark.parametrize(
    "fname,n_rows",
    [("mn_train.csv", 14554), ("mn_val.csv", 1638), ("mn_test.csv", 3841)],
)
def test_mn_splits_parse_and_validate(fname, n_rows, mn_classes):
    ann = load_annotations(_path(fname))
    assert len(ann) == n_rows
    for vid, labels in ann:
        assert vid.startswith("trimmed_videos/") and vid.endswith(".mp4"), vid
        assert len(labels) == 1  # single-label
        assert 0 <= labels[0] < 12, (vid, labels)


def test_ak_label_distribution_sane():
    """Every one of the 140 classes appears in the train split — catches a
    truncated or corrupted vendored file."""
    ann = load_annotations(_path("train_multi.txt"))
    counts = np.zeros(140, dtype=int)
    for _, labels in ann:
        for l in labels:
            counts[l] += 1
    assert (counts > 0).all(), np.where(counts == 0)

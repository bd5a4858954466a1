"""Segmentation metrics tests (lungmask_tpu.metrics)."""

import numpy as np
import pytest

from lungmask_tpu import metrics


def test_confusion_counts_exact():
    pred = np.array([[0, 1], [2, 1]], dtype=np.uint8)
    ref = np.array([[0, 1], [1, 2]], dtype=np.uint8)
    cm = np.asarray(metrics.confusion_counts(pred, ref, 3))
    want = np.zeros((3, 3), dtype=np.int64)
    want[0, 0] = 1  # bg correct
    want[1, 1] = 1  # label1 correct
    want[1, 2] = 1  # ref 1 predicted 2
    want[2, 1] = 1  # ref 2 predicted 1
    np.testing.assert_array_equal(cm, want)


def test_perfect_agreement():
    vol = np.random.default_rng(0).integers(0, 3, size=(4, 8, 8)).astype(np.uint8)
    cmp = metrics.compare_masks(vol, vol)
    assert cmp.voxel_accuracy == 1.0
    assert cmp.macro_dice == 1.0 and cmp.macro_iou == 1.0
    for m in cmp.per_label.values():
        assert m.dice == 1.0 and m.volume_ratio == 1.0


def test_known_overlap():
    ref = np.zeros((1, 4, 4), np.uint8)
    ref[0, :2, :] = 1  # 8 voxels
    pred = np.zeros((1, 4, 4), np.uint8)
    pred[0, 1:3, :] = 1  # 8 voxels, 4 overlapping
    cmp = metrics.compare_masks(pred, ref)
    m = cmp.per_label[1]
    assert m.dice == pytest.approx(2 * 4 / 16)
    assert m.iou == pytest.approx(4 / 12)
    assert m.volume_ratio == pytest.approx(1.0)
    assert metrics.dice(pred, ref) == pytest.approx(0.5)
    # bg agrees on row 3 only (4 voxels) + label-1 overlap (4 voxels)
    assert cmp.voxel_accuracy == pytest.approx((4 + 4) / 16)


def test_absent_label_scores_perfect():
    ref = np.zeros((1, 2, 2), np.uint8)
    pred = np.zeros((1, 2, 2), np.uint8)
    cmp = metrics.compare_masks(pred, ref, n_classes=3)
    assert cmp.per_label[2].dice == 1.0  # absent from both
    assert cmp.macro_dice == 1.0


def test_shape_mismatch_raises():
    with pytest.raises(ValueError, match="shape mismatch"):
        metrics.compare_masks(np.zeros((1, 2, 2)), np.zeros((1, 2, 3)))


def test_negative_labels_rejected():
    """Negative labels would wrap in the device scatter and count as bogus
    background matches silently (review find)."""
    import pytest

    a = np.zeros((4, 4), np.int32)
    b = np.zeros((4, 4), np.int32)
    b[0, 0] = -1
    with pytest.raises(ValueError, match="negative"):
        metrics.compare_masks(a, b)

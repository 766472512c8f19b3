"""Pixel/point-level semantic labeling evaluation — the devkit twin.

The reference bundles a Cityscapes-style evaluator
(devkit/evaluation/evalPixelLevelSemanticLabeling.py: per-class
confusion matrix -> IoU = tp / (tp + fp + fn), mean IoU over classes
with valid ground truth, global pixel accuracy; ignored labels are
excluded from both numerator and denominator). This is the vectorized
numpy core of that pipeline, applicable to label IMAGES (png/npy) or
labeled POINT CLOUD exports (e.g. SemanticBKIMap.export_occupied
semantics vs ground-truth labels).

Usage:
    python -m unified_cvo_tpu.apps.evaluate_semantics GT PRED
        [--num-classes C] [--ignore ID ...]

GT/PRED: .npy int arrays of any matching shape, or image files readable
by cv2 (single channel). Prints per-class IoU, mean IoU, and accuracy.
"""

from __future__ import annotations

import argparse
from typing import Optional, Sequence

import numpy as np


def confusion_matrix(gt: np.ndarray, pred: np.ndarray, num_classes: int,
                     ignore: Sequence[int] = ()) -> np.ndarray:
    """[C, C+1] confusion matrix, rows = ground truth, cols = prediction;
    the extra column C collects INVALID predictions (out of
    [0, num_classes)) on valid-GT pixels — they count as errors (false
    negatives), exactly as the devkit treats predictions of non-evaluated
    labels. Only pixels whose GT label is ignored or out of range are
    excluded (ignoreInEval semantics)."""
    gt = np.asarray(gt).reshape(-1).astype(np.int64)
    pred = np.asarray(pred).reshape(-1).astype(np.int64)
    keep = (gt >= 0) & (gt < num_classes)
    for ig in ignore:
        keep &= gt != ig
    gt, pred = gt[keep], pred[keep]
    pred = np.where((pred >= 0) & (pred < num_classes), pred, num_classes)
    return np.bincount(gt * (num_classes + 1) + pred,
                       minlength=num_classes * (num_classes + 1)).reshape(
                           num_classes, num_classes + 1)


def iou_per_class(conf: np.ndarray) -> np.ndarray:
    """IoU_c = tp / (tp + fp + fn) (getIouScoreForLabel); NaN where the
    class never appears in GT or prediction. `conf` is [C, C+1]: row sums
    (fn) include the invalid-prediction column, so an invalid prediction
    on a valid-GT pixel lowers that class's IoU."""
    C = conf.shape[0]
    tp = np.diag(conf[:, :C]).astype(np.float64)
    fp = conf[:, :C].sum(0) - tp
    fn = conf.sum(1) - tp
    denom = tp + fp + fn
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.where(denom > 0, tp / denom, np.nan)


def evaluate(gt: np.ndarray, pred: np.ndarray, num_classes: int,
             ignore: Sequence[int] = ()) -> dict:
    conf = confusion_matrix(gt, pred, num_classes, ignore)
    ious = iou_per_class(conf)
    total = conf.sum()   # includes invalid predictions -> they hurt accuracy
    acc = (float(np.diag(conf[:, :num_classes]).sum() / total)
           if total else float("nan"))
    miou = float(np.nanmean(ious)) if np.isfinite(ious).any() else float("nan")
    return {"confusion": conf, "iou": ious, "mean_iou": miou,
            "accuracy": acc}


def _load(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 3:
        img = img[..., 0]
    return img


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("gt")
    ap.add_argument("pred")
    ap.add_argument("--num-classes", type=int, default=19)
    ap.add_argument("--ignore", type=int, nargs="*", default=[])
    args = ap.parse_args(argv)
    gt = _load(args.gt)
    pred = _load(args.pred)
    if gt.shape != pred.shape:
        print(f"shape mismatch: {gt.shape} vs {pred.shape}")
        return 1
    r = evaluate(gt, pred, args.num_classes, args.ignore)
    for c, iou in enumerate(r["iou"]):
        if np.isfinite(iou):
            print(f"class {c:3d}: IoU {iou:.4f}")
    print(f"mean IoU: {r['mean_iou']:.4f}")
    print(f"accuracy: {r['accuracy']:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

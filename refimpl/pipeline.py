"""NumPy/OpenCV reference-equivalent pipeline (SURVEY.md §3.2 pass-1 loop).

Per-frame Python loop over cv2/numpy calls — deliberately the shape of the
reference's hot loop, because it is simultaneously the golden oracle and the
CPU baseline denominator for the >=50x target (BASELINE.json:5,7).
Pipeline stage order is pinned in tpuva.graph.config.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import cv2
import numpy as np

from refimpl.tracker import Tracker
from tpuva.graph.config import MorphConfig, PipelineConfig


def morph_kernel(cfg: MorphConfig) -> np.ndarray:
    shape = cv2.MORPH_RECT if cfg.shape == "rect" else cv2.MORPH_ELLIPSE
    return cv2.getStructuringElement(shape, (cfg.ksize, cfg.ksize))


@dataclass
class PipelineResult:
    rows: list = field(default_factory=list)  # (track_id, frame, x, y, area)
    masks: list = field(default_factory=list)  # uint8 0/255, if recorded
    labels: list = field(default_factory=list)  # int32 label maps, if recorded
    detections: list = field(default_factory=list)  # per frame [(x,y,area)]
    background: np.ndarray | None = None


def segment_frame(mask: np.ndarray, min_area: int, max_blobs: int):
    """CCL + stats on a 0/255 mask -> detections [(x, y, area)] in label
    order, area-filtered, capped. Returns (dets, labels)."""
    n, labels, stats, centroids = cv2.connectedComponentsWithStats(
        mask, connectivity=8
    )
    dets = []
    for i in range(1, n):
        area = int(stats[i, cv2.CC_STAT_AREA])
        if area >= min_area:
            dets.append((float(centroids[i, 0]), float(centroids[i, 1]), area))
            if len(dets) >= max_blobs:
                break
    return dets, labels


def run_pipeline(
    clip: np.ndarray,
    cfg: PipelineConfig,
    background0: np.ndarray | None = None,
    record: bool = False,
) -> PipelineResult:
    """clip: (T, H, W) uint8 grayscale."""
    assert clip.ndim == 3 and clip.dtype == np.uint8
    res = PipelineResult()
    tracker = Tracker(cfg.track)
    open_k = morph_kernel(cfg.morph_open) if cfg.morph_open else None
    close_k = morph_kernel(cfg.morph_close) if cfg.morph_close else None
    bg = None

    for t in range(clip.shape[0]):
        f = clip[t]
        if cfg.blur is not None:
            f = cv2.GaussianBlur(f, (cfg.blur.ksize, cfg.blur.ksize), cfg.blur.sigma)
        if cfg.median is not None:
            f = cv2.medianBlur(f, cfg.median.ksize)
        ff = f.astype(np.float32)
        if bg is None:
            bg = (
                background0.astype(np.float32)
                if background0 is not None
                else ff.copy()
            )
        a = np.float32(cfg.background.alpha)
        bg = (np.float32(1) - a) * bg + a * ff
        diff = np.abs(ff - bg)
        if cfg.segment.threshold == "otsu":
            du8 = np.clip(np.rint(diff), 0, 255).astype(np.uint8)
            _thr, mask = cv2.threshold(
                du8, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU
            )
        else:
            mask = ((diff > cfg.segment.threshold) * 255).astype(np.uint8)
        if open_k is not None:
            mask = cv2.morphologyEx(
                mask, cv2.MORPH_OPEN, open_k, iterations=cfg.morph_open.iterations
            )
        if close_k is not None:
            mask = cv2.morphologyEx(
                mask, cv2.MORPH_CLOSE, close_k, iterations=cfg.morph_close.iterations
            )
        dets, labels = segment_frame(
            mask, cfg.segment.min_area, cfg.segment.max_blobs
        )
        tracker.update(t, dets)
        res.detections.append(dets)
        if record:
            res.masks.append(mask)
            res.labels.append(labels)

    res.rows = tracker.rows
    res.background = bg
    return res

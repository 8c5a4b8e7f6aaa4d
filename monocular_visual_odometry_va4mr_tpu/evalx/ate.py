"""Trajectory evaluation: Sim(3)/SE(3) alignment + ATE/RPE.

The reference only overlays (x, z) ground-truth columns on a plot
(reference main.py:133-135; utils.py:20,:47 — Quirk Q7: GT "trajectory" is two
columns of the KITTI pose rows).  Real evaluation needs full-pose alignment:
monocular VO is scale-ambiguous, so ATE is computed after Umeyama similarity
alignment (the BASELINE.json acceptance metric "ATE RMSE on KITTI-05").

Host-side numpy: runs once per sequence, not in the hot loop.
"""
from __future__ import annotations

import numpy as np


def umeyama_alignment(src: np.ndarray, dst: np.ndarray, with_scale: bool = True):
    """Least-squares similarity transform aligning src -> dst.

    Args:
      src, dst: (N, 3) corresponding points (trajectory positions).

    Returns (s, R, t) with dst ~= s * R @ src + t.
    """
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    var_s = (xs**2).sum() / len(src)
    s = float(np.trace(np.diag(D) @ S) / var_s) if with_scale else 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(estimated: np.ndarray, ground_truth: np.ndarray,
             with_scale: bool = True) -> float:
    """Absolute trajectory error RMSE after Sim(3) (or SE(3)) alignment.

    Args:
      estimated, ground_truth: (N, 3) positions, frame-aligned.
    """
    s, R, t = umeyama_alignment(estimated, ground_truth, with_scale)
    aligned = (s * (R @ estimated.T)).T + t
    err = np.linalg.norm(aligned - ground_truth, axis=1)
    return float(np.sqrt((err**2).mean()))


def rpe_stats(estimated: np.ndarray, ground_truth: np.ndarray, delta: int = 1):
    """Relative pose (translation) error over ``delta``-frame steps, after
    global scale alignment. Returns (mean, rmse)."""
    s, R, t = umeyama_alignment(estimated, ground_truth, True)
    aligned = (s * (R @ estimated.T)).T + t
    d_est = aligned[delta:] - aligned[:-delta]
    d_gt = ground_truth[delta:] - ground_truth[:-delta]
    err = np.linalg.norm(d_est - d_gt, axis=1)
    return float(err.mean()), float(np.sqrt((err**2).mean()))

"""Drift instrumentation: per-frame pose error at metric scale + landmark
reprojection quality under the GROUND-TRUTH pose — separates 'tracker feeds
bad uv' from 'map holds bad 3D points' from 'PnP produces bad poses'.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(backend="xla", frames=45, image_shape=(480, 640), stride=4,
         quality=0.03, seed=11, preset="parking"):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from monocular_visual_odometry_va4mr_tpu.core.camera import Camera
    from monocular_visual_odometry_va4mr_tpu.core.config import PRESETS
    from monocular_visual_odometry_va4mr_tpu.dataio import synthetic
    from monocular_visual_odometry_va4mr_tpu.pipeline.vo import VisualOdometry

    scene = synthetic.make_textured_scene(seed=seed, num_frames=frames,
                                          image_shape=image_shape, step=1.0)
    tag = f"textured-s{seed}-f{frames}-{image_shape[0]}x{image_shape[1]}"
    imgs = synthetic.render_all_cached(scene, tag)

    cfg = PRESETS[preset]().replace(image_shape=image_shape,
                                    bootstrap_method="klt")
    cfg = cfg.replace(
        klt=dataclasses.replace(cfg.klt, backend=backend),
        detector=dataclasses.replace(cfg.detector, quality_level=quality))
    vo = VisualOdometry(Camera.from_matrix(scene.K), cfg)
    key = jax.random.PRNGKey(0)

    state = vo.bootstrap(imgs[0], imgs[stride], jax.random.fold_in(key, 0),
                         intermediate=imgs[1:stride])
    # Framework scale: bootstrap translation is unit-norm; GT baseline is
    # stride * step metres.
    gt0 = scene.poses_WC[0][:3, 3]
    gtb = scene.poses_WC[stride][:3, 3]
    s = np.linalg.norm(gtb - gt0)
    print(f"bootstrap: lm={int(state.lm_valid.sum())} scale={s:.2f}")

    K = scene.K
    prev_pos = None
    for i in range(stride + 1, frames):
        prev_state = state
        state = vo.step(state, imgs[i], jax.random.fold_in(key, i))
        T_CW = np.asarray(state.T_CW)
        est_pos = -T_CW[:3, :3].T @ T_CW[:3, 3] * s
        gt_pos = scene.poses_WC[i][:3, 3]
        pose_err = np.linalg.norm(est_pos - gt_pos)
        step_len = (np.linalg.norm(est_pos - prev_pos)
                    if prev_pos is not None else np.nan)
        prev_pos = est_pos
        cand_n = int(np.asarray(state.cand_valid).sum())
        promoted = int((np.asarray(state.lm_gen)
                        > np.asarray(prev_state.lm_gen)).sum())
        # Decompose the promotion gates on the PREVIOUS state's candidates
        # (what fed this step's promotion).
        from monocular_visual_odometry_va4mr_tpu.ops import triangulate as tri
        pv = np.asarray(prev_state.cand_valid)
        age_p = (int(prev_state.frame_idx) + 1
                 - np.asarray(prev_state.cand_first_frame))
        ang = np.asarray(tri.bearing_angle_deg(
            vo.cam, prev_state.cand_first_uv, state.cand_uv,
            prev_state.cand_T_CW_first[:, :3, :3],
            state.T_CW[:3, :3]))
        n_old = int((pv & (age_p > cfg.landmarks.min_baseline_frames)).sum())
        n_ang = int((pv & (ang >= cfg.landmarks.min_baseline_angle_deg)).sum())

        # Landmark quality under the GT pose (scaled world).
        lv = np.asarray(state.lm_valid)
        X = np.asarray(state.lm_xyz)[lv] * s
        uv = np.asarray(state.lm_uv)[lv]
        T_gt = scene.pose_CW(i)
        Xc = X @ T_gt[:3, :3].T + T_gt[:3, 3]
        z = Xc[:, 2]
        pu = K[0, 0] * Xc[:, 0] / np.maximum(z, 1e-6) + K[0, 2]
        pv = K[1, 1] * Xc[:, 1] / np.maximum(z, 1e-6) + K[1, 2]
        rp = np.sqrt((pu - uv[:, 0]) ** 2 + (pv - uv[:, 1]) ** 2)
        ok = z > 0.5
        med = np.median(rp[ok]) if ok.sum() else np.nan
        p90 = np.percentile(rp[ok], 90) if ok.sum() else np.nan
        zmed = np.median(z[ok]) if ok.sum() else np.nan
        print(f"f{i}: lm={lv.sum():4d} inl={int(state.n_inliers):4d} "
              f"cand={cand_n:4d} promo={promoted:3d} "
              f"old={n_old:4d} ang_ok={n_ang:4d} "
              f"st={int(state.status)} pose_err={pose_err:6.2f}m "
              f"step={step_len:5.2f}m "
              f"lmGTreproj med={med:6.2f} p90={p90:7.2f} zmed={zmed:5.1f}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="xla")
    ap.add_argument("--frames", type=int, default=45)
    ap.add_argument("--stride", type=int, default=4)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--preset", default="parking")
    a = ap.parse_args()
    main(backend=a.backend, frames=a.frames, stride=a.stride,
         image_shape=(a.height, a.width), preset=a.preset)

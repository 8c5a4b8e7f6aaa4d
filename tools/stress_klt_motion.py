"""Tracker stress beyond the bench regime (round-3 verdict next-step #7).

Malaga-preset geometry (800x600) under growing inter-frame motion: pure
camera yaw produces near-uniform horizontal image flow; sweep the flow
magnitude up to and past the Pallas path's +-160 px coarse-prior envelope
(COARSE_RANGE=10 coarse px at 1/16 res, ops/klt_pallas.py:46-47) and record
where the pallas2 multilevel chain diverges from the XLA oracle.

cv2's envelope for reference: maxLevel 10, 50 iters (reference main.py:65-68)
-> nominal reach ~2^10 * half-window px, far beyond any real Malaga motion
(800x600 at ~10 Hz urban driving is <100 px/frame).

Usage:  python tools/stress_klt_motion.py
"""
from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from monocular_visual_odometry_va4mr_tpu.dataio import synthetic
    from monocular_visual_odometry_va4mr_tpu.ops import image as imops
    from monocular_visual_odometry_va4mr_tpu.ops import klt, klt_pallas2

    # Wide render so Malaga-sized (800x600) crops stay fully textured for
    # shifts up to 300 px (a too-narrow strip makes large motions
    # untrackable by construction, not by tracker limitation).
    H, W = 600, 1408
    scene = synthetic.make_textured_scene(
        seed=5, num_frames=2, image_shape=(H, W), step=0.0)
    base = np.asarray(scene.render(0), np.float32)

    # Shift-crop pairs: i0 tracks into i1 shifted by (dx, 0) px exactly.
    MARGIN = 304
    i0 = base[:, MARGIN:W - MARGIN]
    rng = np.random.default_rng(0)
    N = 512
    pts = np.stack([
        rng.uniform(40, i0.shape[1] - 40, N),
        rng.uniform(40, i0.shape[0] - 40, N),
    ], 1).astype(np.float32)

    rows = []
    for dx in (20, 40, 80, 120, 150, 160, 180, 220, 280):
        i1 = base[:, MARGIN - dx:W - MARGIN - dx]  # content moves +dx px
        p0 = imops.build_flat_pyramid(jnp.asarray(i0), 16)
        p1 = imops.build_flat_pyramid(jnp.asarray(i1), 16)
        valid = jnp.ones((N,), bool)

        out_p, ok_p, _ = klt_pallas2.track_multilevel(
            p0, p1, jnp.asarray(pts), valid, num_iters=8)
        # XLA oracle: deep pyramid, cv2-style envelope.
        po0 = imops.build_pyramid(jnp.asarray(i0), 6)
        po1 = imops.build_pyramid(jnp.asarray(i1), 6)
        out_x, ok_x, _ = klt.track_features(
            po0, po1, jnp.asarray(pts), valid, window=15, num_iters=20,
            eps=0.01, min_eig_threshold=1e-4, max_residual=20.0)

        gt = pts + np.array([dx, 0.0], np.float32)

        def stats(out, ok):
            ok = np.asarray(ok)
            err = np.linalg.norm(np.asarray(out) - gt, axis=1)
            good = ok & (err < 1.0)
            # gross outlier: ACCEPTED but >3 px wrong (the dangerous case)
            gross = ok & (err > 3.0)
            return (int(ok.sum()), int(good.sum()), int(gross.sum()),
                    float(np.median(err[ok])) if ok.any() else float("nan"))

        n_p, good_p, gross_p, med_p = stats(out_p, ok_p)
        n_x, good_x, gross_x, med_x = stats(out_x, ok_x)
        rows.append({"dx": dx,
                     "pallas2": {"accepted": n_p, "good": good_p,
                                 "gross_outliers": gross_p,
                                 "median_err_px": round(med_p, 3)},
                     "xla": {"accepted": n_x, "good": good_x,
                             "gross_outliers": gross_x,
                             "median_err_px": round(med_x, 3)}})
        print(json.dumps(rows[-1]), flush=True)

    # The envelope claim (recorded in KLTConfig docs): inside +-160 px the
    # pallas2 path must be healthy — most features tracked at sub-pixel
    # error, accepted gross outliers at or below the cv2-style oracle's
    # own rate (measured round 4: pallas2 1.2-2.7% inside the envelope vs
    # the oracle's up to 4.1%; PnP-RANSAC absorbs this).  Beyond it, the
    # failure must stay bounded (<=8% accepted garbage, 0 "good" — the
    # envelope is a hard cliff, not a gradual loss).
    inside = [r for r in rows if r["dx"] <= 160]
    beyond = [r for r in rows if r["dx"] > 180]
    ok_inside = all(r["pallas2"]["good"] > 0.6 * N
                    and r["pallas2"]["gross_outliers"] < 0.035 * N
                    for r in inside)
    safe_beyond = all(r["pallas2"]["gross_outliers"] < 0.08 * N
                      for r in beyond)
    print(json.dumps({"envelope_px": 160, "healthy_inside": ok_inside,
                      "bounded_beyond": safe_beyond}))
    sys.exit(0 if (ok_inside and safe_beyond) else 2)


if __name__ == "__main__":
    main()

"""Track-survival probe: detect corners at frame F0, chain-track them over
consecutive frames with the production tracker (multilevel + FB), and report
per-hop survival plus cause of death (forward gate vs FB round-trip)."""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(f0=10, hops=8, image_shape=(480, 640), seed=11, num_frames=80,
         quality=0.03, fb_thresh=1.0, backend="pallas2"):
    import jax
    import jax.numpy as jnp

    from monocular_visual_odometry_va4mr_tpu.dataio import synthetic
    from monocular_visual_odometry_va4mr_tpu.ops import (corners,
                                                         image as imops,
                                                         klt, klt_pallas,
                                                         klt_pallas2)

    scene = synthetic.make_textured_scene(seed=seed, num_frames=num_frames,
                                          image_shape=image_shape, step=1.0)
    tag = f"textured-s{seed}-f{num_frames}-{image_shape[0]}x{image_shape[1]}"
    frames = synthetic.render_all_cached(scene, tag)

    on_tpu = jax.default_backend() == "tpu" and backend != "xla"

    def pyr(i):
        img = jnp.asarray(frames[i], jnp.float32)
        return (imops.build_flat_pyramid(img, 16) if on_tpu
                else imops.build_pyramid(img, 5))

    def track(p0, p1, pts, valid):
        if on_tpu:
            fn = (klt_pallas2.track_features_pallas2 if backend == "pallas2"
                  else klt_pallas.track_features_pallas)
            return klt_pallas2.track_multilevel(
                p0, p1, pts, valid, track_fn=fn, num_iters=8, eps=0.02,
                min_eig_threshold=1e-4, max_residual=20.0)
        return klt.track_features(p0, p1, pts, valid, window=15,
                                  num_iters=20, eps=0.02,
                                  min_eig_threshold=1e-4, max_residual=20.0)

    img0 = jnp.asarray(frames[f0], jnp.float32)
    uv, _, valid = corners.detect_corners(img0, max_corners=1024,
                                          quality_level=quality, cell=10,
                                          block_size=3, use_harris=False,
                                          harris_k=0.04)
    n0 = int(valid.sum())
    print(f"start: {n0} corners; backend={'ml-'+backend if on_tpu else 'xla'}")

    p_prev = pyr(f0)
    pts = uv
    ok = valid
    for h in range(hops):
        p_next = pyr(f0 + h + 1)
        new_pts, fwd_ok, _ = track(p_prev, p_next, pts, ok)
        back_pts, back_ok, _ = track(p_next, p_prev, new_pts, fwd_ok)
        fb2 = jnp.sum((back_pts - pts) ** 2, axis=-1)
        fb_pass = fwd_ok & back_ok & (fb2 < fb_thresh**2)
        n_ok = int(ok.sum())
        print(f"hop {h}: alive={n_ok:4d} fwd_ok={int(fwd_ok.sum()):4d} "
              f"back_ok={int((fwd_ok & back_ok).sum()):4d} "
              f"fb<{fb_thresh}px={int(fb_pass.sum()):4d} "
              f"fb_med={float(jnp.median(jnp.sqrt(fb2[fwd_ok & back_ok]))):.2f}")
        pts = new_pts
        ok = fb_pass
        p_prev = p_next


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--f0", type=int, default=10)
    ap.add_argument("--hops", type=int, default=8)
    ap.add_argument("--quality", type=float, default=0.03)
    ap.add_argument("--fb", type=float, default=1.0)
    ap.add_argument("--backend", default="pallas2")
    a = ap.parse_args()
    main(f0=a.f0, hops=a.hops, quality=a.quality, fb_thresh=a.fb,
         backend=a.backend)

"""Stepwise in-step-BA diagnostic on the real chip: find the first frame
whose BA trigger produces a non-finite pose/landmark and dump the window
statistics that fed it."""
import dataclasses, sys, json
import numpy as np
sys.path.insert(0, ".")
import bench
import jax
import jax.numpy as jnp
from monocular_visual_odometry_va4mr_tpu.core.camera import Camera
from monocular_visual_odometry_va4mr_tpu.core.config import kitti_config
from monocular_visual_odometry_va4mr_tpu.pipeline.vo import VisualOdometry

every = int(sys.argv[1]) if len(sys.argv) > 1 else 4
nf = int(sys.argv[2]) if len(sys.argv) > 2 else 60
scene, frames = bench.render_scene()
frames = frames[:nf]
cfg = kitti_config().replace(image_shape=scene.image_shape, bootstrap_method="klt")
cfg = cfg.replace(detector=dataclasses.replace(cfg.detector, quality_level=0.03),
                  ba=dataclasses.replace(cfg.ba, every=every))
vo = VisualOdometry(Camera.from_matrix(scene.K), cfg)
key = jax.random.PRNGKey(0)
dev = [jnp.asarray(f, jnp.float32) for f in frames]
b = bench.BOOTSTRAP_STRIDE  # stay on the bench operating point (advisor r3)
st = vo.bootstrap(dev[0], dev[b], jax.random.fold_in(key, 0), intermediate=dev[1:b])
for i in range(b + 1, nf):
    prev = st
    st = vo.step(st, dev[i], jax.random.fold_in(key, i))
    T = np.asarray(st.T_CW); X = np.asarray(st.lm_xyz); baT = np.asarray(st.ba_T)
    lmv = np.asarray(st.lm_valid)
    finT, finX = np.all(np.isfinite(T)), np.all(np.isfinite(X[lmv]))
    if not (finT and finX):
        print(f"frame {i}: finite T={finT} X={finX} status={int(st.status)} n_inl={int(st.n_inliers)}")
        gen = np.asarray(prev.lm_gen); bag = np.asarray(prev.ba_gen); bam = np.asarray(prev.ba_mask)
        mw = bam & (bag == gen[None, :])
        n_obs = mw.sum(0)
        part = (n_obs >= cfg.ba.min_obs) & np.asarray(prev.lm_valid)
        Xp = np.asarray(prev.lm_xyz)
        # depths in current camera
        Tc = np.asarray(prev.T_CW)
        Z = (Xp @ Tc[:3,:3].T + Tc[:3,3])[:, 2]
        print(f"  eligible={part.sum()} n_obs_max={n_obs.max()} depth[min,max]={Z[part].min():.2f},{Z[part].max():.2f}")
        print(f"  prevT finite={np.all(np.isfinite(Tc))} prev baT finite={np.all(np.isfinite(np.asarray(prev.ba_T)))}")
        print(f"  lm_xyz norm max={np.abs(Xp[part]).max():.1f}")
        break
else:
    print("no NaN in", nf, "frames; final status", int(st.status))

"""TPU-native monocular visual-odometry / SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
``ManuelWendl/Monocular_Visual_Odometry_VA4MR`` pipeline (CPU / OpenCV), built
TPU-first:

* every OpenCV kernel the reference calls (SIFT, BFMatcher, goodFeaturesToTrack,
  calcOpticalFlowPyrLK, findEssentialMat, recoverPose, triangulatePoints,
  solvePnPRansac, Rodrigues) is re-implemented as batched, fixed-shape JAX /
  Pallas code (see ``ops/``),
* the per-frame state machine (reference ``VisualOdometryPipeLine.py``) becomes
  a single jit-compiled ``step(state, image) -> state`` over a fixed-capacity
  slotted state pytree (see ``pipeline/``),
* a sliding-window bundle-adjustment and pose-graph back-end (absent in the
  reference) is added in ``backend/`` and scaled over device meshes in
  ``parallel/``.

Layout:
  core/      SO(3)/SE(3), camera model, config presets, slotted-state utilities
  ops/       TPU kernels: pyramid, corners, KLT, triangulation, E-matrix,
             PnP-RANSAC, SIFT, descriptor matching
  pipeline/  bootstrap + per-frame step + lax.scan driver
  backend/   sliding-window BA (Schur complement), pose graph
  parallel/  mesh construction, sharded BA, sequence-level data parallelism
  dataio/    KITTI / Malaga / Parking loaders, synthetic scenes, prefetch
  evalx/     ATE / RPE metrics with Sim(3) alignment
  viz/       offline dashboard renderer (reference main.py's 2x2 interface)
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: first compiles of the KITTI-resolution
# graphs take many minutes through the remote-compile relay; caching them on
# disk makes every subsequent process start in seconds.  Opt out with
# MVO_NO_COMPILE_CACHE=1 (e.g. when bisecting compiler issues).
import os as _os

if not _os.environ.get("MVO_NO_COMPILE_CACHE"):
    try:
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir",
                           _os.environ.get("MVO_COMPILE_CACHE_DIR",
                                           "/tmp/mvo_jax_cache"))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

"""Whole-sequence processing with ``lax.scan`` — the per-frame step compiled
ONCE and iterated on-device, with zero per-frame host dispatch.

This is the execution model the FrameState design buys (SURVEY.md §7: "step:
(FrameState, image) -> (FrameState, outputs) — jit-compiled, scan-able"):
the host uploads a block of frames, the device runs the VO loop over the
whole block, and only the compact per-frame outputs come back.  Used by
bench.py for the headline throughput and by the sequence-DP path
(frames axis on-device, sequences sharded over the mesh).

``run_streaming`` is the production path for reference-scale sequences
(KITTI-05 = 2761 frames, reference main.py:17) and carries the full
subsystem set the host runner has:
  * fixed-shape blocks with the padded tail masked INSIDE the scan (inactive
    steps are identity), so the returned state is exactly the state after
    the last real frame;
  * re-bootstrap recovery from tracking loss between/within blocks (the
    reference fail-stops, VisualOdometryPipeLine.py:352,:358);
  * optional per-frame landmark snapshots for loop-closure / pose-graph
    construction (pipeline/posegraph_runner.py);
  * optional checkpointing at block boundaries (pipeline/checkpoint.py).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.state import STATUS_TRACKING, FrameState
from .vo import VisualOdometry


class ScanOutputs(NamedTuple):
    T_CW: jnp.ndarray  # (F, 4, 4)
    n_inliers: jnp.ndarray  # (F,) int32
    n_tracked: jnp.ndarray  # (F,) int32
    status: jnp.ndarray  # (F,) int32


class ScanOutputsLm(NamedTuple):
    """ScanOutputs + a compact per-frame landmark snapshot (pixel position,
    camera-frame depth, validity) — what the pose-graph keyframe bank needs
    for its loop-edge metric-scale estimate (posegraph_runner.Keyframe
    lm_uv/lm_z), emitted straight from the scan so the streaming path can
    build a pose graph without per-frame host dispatch."""

    T_CW: jnp.ndarray  # (F, 4, 4)
    n_inliers: jnp.ndarray  # (F,) int32
    n_tracked: jnp.ndarray  # (F,) int32
    status: jnp.ndarray  # (F,) int32
    lm_uv: jnp.ndarray  # (F, K, 2)
    lm_z: jnp.ndarray  # (F, K) camera-frame depth
    lm_valid: jnp.ndarray  # (F, K) bool


def make_scan_step(vo: VisualOdometry, *, emit_landmarks: bool = False,
                   masked: bool = False):
    """Returns jitted (state, images (F,H,W), keys (F,2)[, active (F,)])
    -> (state, outputs).

    ``masked``: inputs carry a per-frame ``active`` flag; inactive steps
    pass the state through unchanged (identity), so padded tail frames are
    true no-ops and the returned state corresponds to the last ACTIVE frame
    (advisor round-4: previously the tail block advanced the state through
    duplicated last frames).
    ``emit_landmarks``: outputs include the per-frame landmark snapshot
    (ScanOutputsLm) for pose-graph construction.
    """

    def scan_body(state: FrameState, inp):
        if masked:
            img, key, active = inp
        else:
            img, key = inp
        if img.dtype != jnp.float32:
            # uint8 upload path (see next_block); trace-time conditional so
            # f32 graphs are byte-identical to before (an unconditional
            # astype changed XLA fusions and perturbed f32 trajectories).
            img = img.astype(jnp.float32)
        if masked:
            new_state = jax.lax.cond(
                active, lambda s: vo._step_impl(s, img, key), lambda s: s,
                state)
        else:
            new_state = vo._step_impl(state, img, key)
        out = (new_state.T_CW, new_state.n_inliers, new_state.n_tracked,
               new_state.status)
        if emit_landmarks:
            z = (new_state.lm_xyz @ new_state.T_CW[2, :3]
                 + new_state.T_CW[2, 3])
            out = out + (new_state.lm_uv, z,
                         new_state.lm_valid & jnp.isfinite(z) & (z > 0))
        return new_state, out

    out_t = ScanOutputsLm if emit_landmarks else ScanOutputs

    if masked:
        @jax.jit
        def run(state: FrameState, images: jnp.ndarray, keys: jnp.ndarray,
                active: jnp.ndarray):
            final, outs = jax.lax.scan(scan_body, state,
                                       (images, keys, active))
            return final, out_t(*outs)
    else:
        @jax.jit
        def run(state: FrameState, images: jnp.ndarray, keys: jnp.ndarray):
            final, outs = jax.lax.scan(scan_body, state, (images, keys))
            return final, out_t(*outs)

    return run


def run_block(vo: VisualOdometry, state: FrameState, images, seed_keys):
    """Convenience wrapper: process a stacked frame block on device."""
    run = make_scan_step(vo)
    return run(state, jnp.asarray(images, jnp.float32), seed_keys)


class StreamInfo(NamedTuple):
    recoveries: int
    lost: int  # total LOST frames across the returned outputs
    blocks: int


def _step_len_prior(pose_hist, n: int = 6):
    """Median per-frame translation over recent tracked frames — the
    velocity prior used to restore metric-consistent scale on re-bootstrap
    (same estimator as pipeline/runner._recent_step_len)."""
    import numpy as np

    good = [T for (s, T) in pose_hist if s == STATUS_TRACKING]
    if len(good) < 3:
        return None
    ps = np.stack([-T[:3, :3].T @ T[:3, 3] for T in good[-(n + 1):]])
    d = np.linalg.norm(np.diff(ps, axis=0), axis=1)
    d = d[d > 1e-9]
    return float(np.median(d)) if len(d) else None


def run_streaming(vo: VisualOdometry, state: FrameState, frames, key,
                  *, block: int = 64, emit_landmarks: bool = False,
                  recover: bool = False, recover_after: int = 2,
                  bootstrap_stride: int = 2,
                  checkpoint_dir=None, checkpoint_every_blocks: int = 0,
                  verbose: bool = False):
    """Long-sequence streaming: fixed-size scan blocks with the FrameState
    carried across block boundaries, host upload of block k+1 overlapped
    with device compute of block k (JAX async dispatch — the ``run`` call
    returns before the device finishes, so the host stacks and uploads the
    next block while the chip works).

    ONE compiled executable processes every block (same static shape; the
    tail is padded and masked to identity steps inside the scan, so the
    returned ``final_state`` is exactly the state after the last real
    frame), O(block) host memory, and only the compact per-frame outputs
    come back per block.

    ``recover``: on a LOST streak of >= ``recover_after`` frames the driver
    re-bootstraps from the block's host-side images, transports the fresh
    state into the original world frame at a velocity-prior scale
    (pipeline/runner.reanchor_state), and RE-RUNS the remaining frames of
    the block with the recovered state — so a mid-block tracking loss costs
    ~(blackout + recover_after + bootstrap_stride) LOST frames, not the
    rest of the block.  (The reference fail-stops instead,
    VisualOdometryPipeLine.py:352,:358.)

    ``frames``: iterator/iterable of (frame_idx, image) pairs (e.g.
    ``SequenceSpec.frames()`` streaming through the native PNG decoder).
    Returns (final_state, outputs over all frames, frame_ids, StreamInfo).
    """
    import numpy as np

    run = make_scan_step(vo, emit_landmarks=emit_landmarks, masked=True)
    out_t = ScanOutputsLm if emit_landmarks else ScanOutputs
    it = iter(frames)
    pending = []  # (idx, img) pushed back by recovery re-runs

    def next_block():
        ids, imgs = [], []
        while len(imgs) < block:
            if pending:
                idx, img = pending.pop(0)
            else:
                try:
                    idx, img = next(it)
                except StopIteration:
                    break
            ids.append(idx)
            # Keep uint8 frames as uint8: the host->device block upload is
            # the streaming bottleneck on a tunneled chip (64 frames of
            # 376x1241 f32 = 119 MB/block; uint8 is 4x less), and the
            # on-device cast to f32 is exact for 8-bit values.
            a = np.asarray(img)
            imgs.append(a if a.dtype == np.uint8
                        else np.asarray(img, np.float32))
        if not imgs:
            return None
        n = len(imgs)
        pad = block - n
        stacked = np.stack(imgs + [imgs[-1]] * pad)
        active = np.arange(block) < n
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.asarray(ids + [ids[-1]] * pad, jnp.int32))
        dev = (jax.device_put(jnp.asarray(stacked)), keys,
               jnp.asarray(active))
        return ids, imgs, dev, n

    def _old_map_points(j):
        """World-frame landmark map of the last TRACKING frame before the
        block index ``j`` — reconstructed from the per-frame snapshot
        (uv + camera depth + pose) the scan already emits, feeding the
        map-based recovery scale (runner.map_scale_from_points).  Falls
        back to the snapshot carried from a previous block when the whole
        streak precedes this block."""
        snap = last_good_lm[0]
        for i in range(j - 1, -1, -1):
            if outs_np.status[i] == STATUS_TRACKING:
                snap = (outs_np.lm_uv[i], outs_np.lm_z[i],
                        outs_np.lm_valid[i], outs_np.T_CW[i])
                break
        if snap is None:
            return None
        uv, z, valid, T = snap
        v = np.asarray(valid)
        if not np.any(v):
            return None
        uv = np.asarray(uv, np.float64)[v]
        z = np.asarray(z, np.float64)[v]
        fx, fy = float(vo.cam.fx), float(vo.cam.fy)
        cx, cy = float(vo.cam.cx), float(vo.cam.cy)
        x_cam = np.stack([(uv[:, 0] - cx) / fx * z,
                          (uv[:, 1] - cy) / fy * z, z], axis=1)
        T = np.asarray(T, np.float64)
        return (x_cam - T[:3, 3]) @ T[:3, :3]  # R^T (x - t), row-vector

    def try_recover(ids, imgs, statuses, n):
        """Find the first LOST-streak trigger in this block and attempt a
        re-bootstrap at a few positions after it.  Returns (e, new_state)
        = last output index to keep + recovered state, or None."""
        streak = streak_in
        j = None
        for i in range(n):
            streak = streak + 1 if statuses[i] != STATUS_TRACKING else 0
            if streak >= recover_after:
                j = i
                break
        if j is None:
            return None
        s = bootstrap_stride
        # First candidate: re-bootstrap ENDING AT the trigger frame itself.
        # On content-driven loss (structure leaving the view, occlusion) the
        # preceding images are perfectly good, so this recovers with only
        # the streak frames lost instead of waiting bootstrap_stride+ more
        # frames.  On a blackout those frames are the blackout — the
        # bootstrap fails its status gate and the later candidates run.
        cands = [j] if j - s >= 0 else []
        cands += sorted({min(j + d, n - 1) for d in (s + 1, s + 4, s + 10)}
                        | {n - 1})
        for e in cands:
            if e - s < 0:
                continue
            span = imgs[e - s:e + 1]
            if len(span) < s + 1:
                continue
            fresh = vo.bootstrap(
                span[0], span[-1],
                jax.random.fold_in(key, 10_000_000 + ids[e]),
                intermediate=span[1:-1])
            if int(fresh.status) != STATUS_TRACKING:
                continue
            from .runner import map_scale_from_points, reanchor_state

            # Anchor = pose held through the LOST frames (== last tracked
            # pose), approximating the bootstrap's first-frame extrinsics.
            anchor = np.asarray(outs_np.T_CW[max(e - s, 0)])
            # Map-based scale first (velocity-robust), prior as fallback.
            scale = None
            src = "map"
            if emit_landmarks:
                X_old = _old_map_points(j)
                if X_old is not None:
                    scale = map_scale_from_points(X_old, fresh, vo.cam,
                                                  anchor)
            if scale is None:
                src = "velocity-prior"
                # Include this block's pre-trigger frames: a first-block
                # recovery otherwise sees an empty history and silently
                # falls back to scale 1.0.
                hist = pose_hist + [(int(statuses[i]), outs_np.T_CW[i])
                                    for i in range(j)]
                step_len = _step_len_prior(hist)
                scale = step_len * s if step_len else 1.0
            new_state = reanchor_state(fresh, anchor, scale)
            if verbose:
                print(f"stream: re-bootstrapped at frame {ids[e]} "
                      f"(scale {scale:.3f}, {src})")
            return e, new_state
        return None

    outs_all = []
    frame_ids = []
    pose_hist = []  # (status, T_CW) of recent emitted frames
    # (uv, z, valid, T_CW) of the last emitted TRACKING frame, carried
    # across blocks for the map-based recovery scale.
    last_good_lm = [None]
    streak_in = 0
    recoveries = 0
    blocks = 0
    nxt = next_block()
    while nxt is not None:
        ids, imgs, dev, n = nxt
        new_state, outs = run(state, *dev)  # async: returns immediately
        # Overlap: stack/upload the NEXT block while the device runs
        # (skipped when recovery is on — the block may need a re-run, and
        # correctness beats one block of overlap on the recovery path).
        nxt_pref = next_block() if not recover else None
        outs_np = jax.tree.map(np.asarray, outs)
        statuses = outs_np.status

        keep = n
        if recover:
            rec = try_recover(ids, imgs, statuses, n)
            if rec is not None:
                e, state = rec[0], rec[1]
                keep = e + 1
                # Re-run the rest of the block with the recovered state.
                pending[:0] = list(zip(ids[keep:n], imgs[keep:n]))
                recoveries += 1
            else:
                state = new_state
        else:
            state = new_state

        outs_all.append(jax.tree.map(lambda x: x[:keep], outs_np))
        frame_ids.extend(ids[:keep])
        if emit_landmarks:
            for i in range(keep - 1, -1, -1):
                if statuses[i] == STATUS_TRACKING:
                    last_good_lm[0] = (outs_np.lm_uv[i], outs_np.lm_z[i],
                                       outs_np.lm_valid[i], outs_np.T_CW[i])
                    break
        for i in range(keep):
            pose_hist.append((int(statuses[i]), outs_np.T_CW[i]))
        del pose_hist[:-12]
        # LOST streak carried into the next block's trigger scan.
        streak_in = 0
        for st_i, _ in pose_hist:
            streak_in = streak_in + 1 if st_i != STATUS_TRACKING else 0
        blocks += 1
        if checkpoint_dir and checkpoint_every_blocks and \
                blocks % checkpoint_every_blocks == 0:
            from . import checkpoint

            checkpoint.save(checkpoint_dir, state, frame_ids[-1])
        nxt = nxt_pref if nxt_pref is not None else next_block()

    merged = out_t(*(np.concatenate([getattr(o, f) for o in outs_all])
                     for f in out_t._fields))
    lost = int(np.sum(merged.status != STATUS_TRACKING))
    return state, merged, frame_ids, StreamInfo(recoveries, lost, blocks)

"""E2E pose-graph integration (pipeline/posegraph_runner.py): keyframe bank,
SIFT loop-closure detection on a loopy scene, drift reduction (round-2
verdict missing #5: backend/posegraph.py previously had no caller)."""
import numpy as np
import pytest

from monocular_visual_odometry_va4mr_tpu.core.camera import Camera
from monocular_visual_odometry_va4mr_tpu.core.config import parking_config
from monocular_visual_odometry_va4mr_tpu.dataio import synthetic
from monocular_visual_odometry_va4mr_tpu.evalx import ate_rmse
from monocular_visual_odometry_va4mr_tpu.pipeline.posegraph_runner import (
    KeyframeBank, refine_trajectory)
from monocular_visual_odometry_va4mr_tpu.pipeline.runner import FrameRecord
from monocular_visual_odometry_va4mr_tpu.pipeline.vo import VisualOdometry


@pytest.fixture(scope="module")
def orbit_run():
    """Drive the VO manually around the orbit scene, collecting keyframes."""
    import dataclasses

    import jax

    scene = synthetic.make_orbit_scene(seed=4, num_frames=110,
                                       image_shape=(320, 416))
    frames = [synthetic.render_frame(scene, i) for i in range(110)]
    cfg = parking_config().replace(image_shape=scene.image_shape,
                                   bootstrap_method="klt")
    cfg = cfg.replace(detector=dataclasses.replace(cfg.detector,
                                                   quality_level=0.02),
                      landmarks=dataclasses.replace(cfg.landmarks,
                                                    max_dist=200.0))
    vo = VisualOdometry(Camera.from_matrix(scene.K), cfg)
    key = jax.random.PRNGKey(0)
    state = vo.bootstrap(frames[0], frames[2], jax.random.fold_in(key, 0),
                         intermediate=frames[1:2])
    bank = KeyframeBank(vo, every=8, max_features=384)
    records = []

    def record(i, st):
        T_CW = np.asarray(st.T_CW)
        T_WC = np.eye(4)
        T_WC[:3, :3] = T_CW[:3, :3].T
        T_WC[:3, 3] = -T_CW[:3, :3].T @ T_CW[:3, 3]
        records.append(FrameRecord(frame=i, T_WC=T_WC,
                                   n_inliers=int(st.n_inliers),
                                   n_tracked=int(st.n_tracked),
                                   status=int(st.status), wall_ms=0.0))

    record(2, state)
    bank.maybe_add(0, 2, state, frames[2])
    for i in range(3, 110):
        state = vo.step(state, frames[i], jax.random.fold_in(key, i))
        record(i, state)
        bank.maybe_add(len(records) - 1, i, state, frames[i])
    return scene, vo, bank, records


class TestPosegraphPipeline:
    def test_loop_closures_found_on_orbit(self, orbit_run):
        from monocular_visual_odometry_va4mr_tpu.pipeline.posegraph_runner import (
            detect_loops)

        scene, vo, bank, records = orbit_run
        assert len(bank.keyframes) >= 8
        loops = detect_loops(bank, vo.cam, min_gap_frames=30,
                             min_matches=30, min_inliers=20)
        # The orbit revisits its start: at least one far-apart pair must
        # verify geometrically.
        assert len(loops) >= 1, [
            (k.frame, int(k.valid.sum())) for k in bank.keyframes]

    def test_refinement_reduces_injected_drift(self, orbit_run):
        scene, vo, bank, records = orbit_run
        gt = scene.poses_WC[[r.frame for r in records], :3, 3]

        # Inject synthetic drift: yaw the world progressively after the
        # first third of the run (what accumulated odometry error does).
        import copy

        drift_records = copy.deepcopy(records)
        k0 = len(records) // 3
        for n, r in enumerate(drift_records):
            ang = 0.004 * max(0, n - k0)
            c, s = np.cos(ang), np.sin(ang)
            Rz = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
            D = np.eye(4)
            D[:3, :3] = Rz
            r.T_WC = D @ r.T_WC
        drift_bank = copy.deepcopy(bank)
        for k in drift_bank.keyframes:
            # keyframe T_CW must match the drifted record's inverse
            T_WC = drift_records[k.record_idx].T_WC
            T = np.eye(4)
            T[:3, :3] = T_WC[:3, :3].T
            T[:3, 3] = -T_WC[:3, :3].T @ T_WC[:3, 3]
            k.T_CW = T

        est_drift = np.stack([r.T_WC[:3, 3] for r in drift_records])
        ate_drift = ate_rmse(est_drift, gt)

        refined = refine_trajectory(drift_records, drift_bank, vo.cam,
                                    min_gap_frames=30, min_matches=30,
                                    min_inliers=20, verbose=True)
        assert refined is not None, "no loop closures -> no refinement"
        ate_refined = ate_rmse(refined, gt)
        assert ate_refined < 0.8 * ate_drift, (ate_refined, ate_drift)

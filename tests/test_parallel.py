"""Multi-device tests on the 8-way virtual CPU mesh (SURVEY.md §4 item 4)."""
import jax
import numpy as np

from __graft_entry__ import dryrun_multichip, entry


class TestGraftEntry:
    def test_entry_compiles(self):
        fn, args = entry()
        out = jax.jit(fn)(*args)
        assert out.T_CW.shape == (4, 4)

    def test_dryrun_multichip(self):
        assert len(jax.devices()) >= 8
        dryrun_multichip(8)


class TestMultiSeqDP:
    def test_lockstep_matches_individual(self):
        import numpy as np

        from monocular_visual_odometry_va4mr_tpu.core.camera import Camera
        from monocular_visual_odometry_va4mr_tpu.dataio import synthetic
        from monocular_visual_odometry_va4mr_tpu.parallel import multi_seq
        from monocular_visual_odometry_va4mr_tpu.pipeline import (
            VisualOdometry, run_sequence,
        )
        from tests.test_pipeline import small_config

        scenes = [
            synthetic.make_corridor_scene(seed=s, num_frames=10,
                                          num_points=2000,
                                          image_shape=(160, 224), step=0.5)
            for s in (1, 2)
        ]
        cfg = small_config((160, 224))
        vo = VisualOdometry(Camera.from_matrix(scenes[0].K), cfg)
        seqs = [[synthetic.render_frame(sc, i) for i in range(10)]
                for sc in scenes]

        res = multi_seq.run_sequences_dp(vo, seqs, n_devices=2,
                                         bootstrap_stride=2)
        assert res.positions.shape == (2, 7, 3)
        assert (res.status == 0).all()

        # Sequence 0 in the batch must match a solo run (same keys derivation
        # differs, so compare trajectories loosely via ATE).
        solo = run_sequence(vo, ((i, f) for i, f in enumerate(seqs[0])),
                            bootstrap_stride=2)
        from monocular_visual_odometry_va4mr_tpu.evalx import ate_rmse

        # solo.positions[0] is the bootstrap record (frame 2); the batch
        # outputs start at frame 3.
        ate = ate_rmse(res.positions[0], solo.positions[1:])
        assert ate < 0.12, ate  # different RANSAC keys -> slightly different paths


class TestMultihost:
    def test_global_mesh(self):
        from monocular_visual_odometry_va4mr_tpu.parallel import multihost

        multihost.initialize()  # no-op single process
        mesh = multihost.global_mesh("lm")
        assert mesh.devices.size >= 8
        m2 = multihost.grid_mesh(2, 4)
        assert m2.devices.shape == (2, 4)

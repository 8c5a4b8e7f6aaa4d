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


class TestTrajBA:
    """Keyframe-axis trajectory BA with ppermute halo exchange
    (parallel/traj_ba.py — SURVEY.md §2c SP/CP analog)."""

    def test_converges_to_ground_truth(self):
        from monocular_visual_odometry_va4mr_tpu.parallel import seq_dp, traj_ba

        D, S, L = 4, 6, 96
        noisy, gt, cam = traj_ba.build_synthetic_traj(D, S, L, seed=3)
        mesh = seq_dp.make_mesh(D, "kf")
        seg = traj_ba.shard_segments(noisy, mesh, "kf")
        out, costs = traj_ba.run_traj_ba(seg, cam, mesh=mesh, axis="kf",
                                         iters=12)
        costs = np.asarray(costs)
        assert costs[-1] < 0.05 * costs[0], costs
        # Poses must approach ground truth (halo exchange propagates the
        # anchor gauge through every segment).
        t_err = np.linalg.norm(
            np.asarray(out.T_CW)[:, :3, 3] - np.asarray(gt.T_CW)[:, :3, 3],
            axis=1)
        t0_err = np.linalg.norm(
            np.asarray(noisy.T_CW)[:, :3, 3] - np.asarray(gt.T_CW)[:, :3, 3],
            axis=1)
        assert np.median(t_err) < 0.25 * np.median(t0_err), (
            np.median(t_err), np.median(t0_err))

    def test_matches_unsharded_blocks(self):
        """One halo iteration must equal running backend.ba on each segment
        window with frozen halo poses (the sharding is an execution detail,
        not a different algorithm)."""
        import jax.numpy as jnp

        from monocular_visual_odometry_va4mr_tpu.backend import ba
        from monocular_visual_odometry_va4mr_tpu.parallel import seq_dp, traj_ba

        D, S, L = 2, 4, 64
        noisy, gt, cam = traj_ba.build_synthetic_traj(D, S, L, seed=5)
        mesh = seq_dp.make_mesh(D, "kf")
        out, costs = traj_ba.run_traj_ba(
            traj_ba.shard_segments(noisy, mesh, "kf"), cam, mesh=mesh,
            axis="kf", iters=1, damping=1e-4)

        # Reference: per-segment windows with the halo rows frozen.
        T_ref = []
        for d in range(D):
            halo = (np.asarray(noisy.anchor_T_CW) if d == 0
                    else np.asarray(noisy.T_CW[d * S - 2:d * S]))
            win = ba.BAWindow(
                T_CW=jnp.asarray(
                    np.concatenate([halo,
                                    np.asarray(noisy.T_CW[d * S:(d + 1) * S])])),
                lm_xyz=noisy.lm_xyz[d * L:(d + 1) * L],
                obs_uv=noisy.obs_uv[d],
                obs_mask=noisy.obs_mask[d],
            )
            w_out, _ = ba.run_ba(win, cam, iters=1, n_fixed=2)
            T_ref.append(np.asarray(w_out.T_CW[2:]))
        np.testing.assert_allclose(np.asarray(out.T_CW),
                                   np.concatenate(T_ref), atol=2e-4)


class TestCollectiveStructure:
    """Pin the BASELINE.md claim 'comm volume per GN iteration is constant
    in shard count' in compiled HLO (round-4 verdict weak #1): the sharded
    BA paths must lower to exactly the advertised collectives — one
    all-reduce of the reduced camera system (+cost scalar) per landmark-BA
    iteration, one (2,4,4) collective-permute + one cost all-reduce per
    traj-BA iteration — and nothing else (no all-gathers of landmark
    tables, no all-to-alls)."""

    @staticmethod
    def _collect(txt, op):
        import re

        # Instruction definitions like
        #   %all-reduce.1 = (f32[8,8,6,6], f32[8,6], f32[]) all-reduce(...
        #   %ppermute.11 = f32[2,4,4]{2,1,0} collective-permute(...
        # (optional layout suffix; also matches async -start forms).
        pat = re.compile(
            r"= *((?:\([^)]*\))|(?:[a-z0-9]+\[[^\]]*\](?:\{[^}]*\})?)) *"
            + op + r"(?:-start)?\(")
        return pat.findall(txt)

    @staticmethod
    def _payload_bytes(shape_str):
        import re

        total = 0
        for dims in re.findall(r"f32\[([0-9,]*)\]", shape_str):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += 4 * n
        return total

    def test_ba_sharded_collectives(self):
        import jax.numpy as jnp

        from monocular_visual_odometry_va4mr_tpu.backend import ba
        from monocular_visual_odometry_va4mr_tpu.core.camera import Camera
        from monocular_visual_odometry_va4mr_tpu.parallel import ba_sharded
        from monocular_visual_odometry_va4mr_tpu.parallel.seq_dp import (
            make_mesh)
        from tests.test_ba import K, make_ba_problem

        window, _, _ = make_ba_problem(np.random.default_rng(0), W=8, L=256)
        cam = Camera.from_matrix(K)
        mesh = make_mesh(8, "lm")
        sharded = ba_sharded.shard_window(window, mesh, "lm")

        counts = {}
        for iters in (3, 6):
            txt = ba_sharded.run_ba_sharded.lower(
                sharded, cam, mesh=mesh, axis="lm",
                iters=iters).compile().as_text()
            ars = self._collect(txt, "all-reduce")
            counts[iters] = len(ars)
            # The reduced camera system (W,W,6,6)+(W,6) (+ scalar cost) is
            # the ONLY all-reduced payload: <= 3 all-reduce defs (XLA may
            # combine them), total payload = 9412 B = the "9.2 KiB psum"
            # in BASELINE.md, independent of landmark count.
            assert 1 <= len(ars) <= 3, txt[:2000]
            payload = sum(self._payload_bytes(s) for s in ars)
            assert payload == 8 * 8 * 36 * 4 + 8 * 6 * 4 + 4, (payload, ars)
            assert not self._collect(txt, "all-gather")
            assert not self._collect(txt, "all-to-all")
            assert not self._collect(txt, "collective-permute")
        # Same collective structure regardless of iteration count: the
        # collectives live once inside the scan body.
        assert counts[3] == counts[6], counts

    def test_traj_ba_collectives(self):
        from monocular_visual_odometry_va4mr_tpu.core.camera import Camera
        from monocular_visual_odometry_va4mr_tpu.parallel import (seq_dp,
                                                                  traj_ba)

        D = 4
        noisy, _, cam = traj_ba.build_synthetic_traj(D, 8, 256, seed=1)
        mesh = seq_dp.make_mesh(D, "kf")
        seg = traj_ba.shard_segments(noisy, mesh, "kf")
        txt = traj_ba.run_traj_ba.lower(
            seg, cam, mesh=mesh, axis="kf", iters=4).compile().as_text()

        cps = self._collect(txt, "collective-permute")
        assert len(cps) == 1, cps
        # Halo = two 4x4 poses = 128 B (BASELINE.md "128 B ppermute").
        assert self._payload_bytes(cps[0]) == 2 * 16 * 4, cps
        ars = self._collect(txt, "all-reduce")
        assert len(ars) == 1 and self._payload_bytes(ars[0]) == 4, ars
        assert not self._collect(txt, "all-gather")
        assert not self._collect(txt, "all-to-all")

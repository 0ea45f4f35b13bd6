"""Multi-process (multi-host analog) shard invariance.

Two OS processes x 4 virtual CPU devices each join a jax.distributed
cluster (Gloo collectives — the DCN analog), run the sharded forward over
a hosts-major ('rays','prims') mesh, and the result must match the
single-process dense forward on the identical scene. SURVEY.md §2.7 /
BASELINE config 5.
"""

import jax
import numpy as np

from audio_raytracer_tpu.parallel import distributed

RAY_COUNT = 64
PRIM_SHARDS = 2
RAY_SHARDS = 4  # 2 processes x 4 local devices / 2 prim shards


def _dense_reference():
    """The same workload _dist_worker runs, on one process, dense
    (distributed.check_workload — shared definition, cannot drift)."""
    return distributed.dense_check_reference(RAY_COUNT, PRIM_SHARDS,
                                             RAY_SHARDS)


class TestTwoProcessCluster:
    def test_matches_single_process(self):
        got = distributed.run_two_process_check(
            ray_count=RAY_COUNT, local_devices=4, prim_shards=PRIM_SHARDS,
            port=9935)
        want = _dense_reference()
        # The check workload keeps muffle strictly interior so the
        # comparison discriminates (a zero-saturated muffle would match
        # a broken psum that clamps to zero).
        assert (want["muffle"] > 0.0).all() and (want["muffle"] < 1.0).all()
        np.testing.assert_allclose(got["muffle"], want["muffle"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got["reverb_strength"],
                                   want["reverb_strength"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got["reverb_volume"],
                                   want["reverb_volume"],
                                   rtol=1e-5, atol=1e-6)


class TestKernelTierCluster:
    def test_pallas_interpret_cluster_matches_single_process(self):
        """Multi-host x Pallas (BASELINE config 5's production pairing):
        the 2-process jax.distributed cluster with a kernel engine per
        shard must match the single-process dense forward."""
        got = distributed.run_two_process_check(
            ray_count=RAY_COUNT, local_devices=4, prim_shards=PRIM_SHARDS,
            port=9937, backend="pallas_interpret")
        want = _dense_reference()
        np.testing.assert_allclose(got["muffle"], want["muffle"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got["reverb_volume"],
                                   want["reverb_volume"],
                                   rtol=1e-5, atol=1e-6)


class TestMeshLayout:
    def test_prims_axis_never_crosses_hosts(self):
        # With a single process the helper still builds a valid mesh.
        mesh = distributed.make_distributed_mesh(
            prim_shards=2, devices=jax.devices()[:8])
        assert mesh.shape == {"rays": 4, "prims": 2}
        devs = np.asarray(mesh.devices)
        for row in devs:
            assert len({d.process_index for d in row}) == 1

    def test_local_ray_slice_single_process(self):
        s = distributed.local_ray_slice(128)
        assert (s.start, s.stop) == (0, 128)

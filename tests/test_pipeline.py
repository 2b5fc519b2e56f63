"""High-level RegistrationPipeline test: scans in, consistent map out."""

import numpy as np

from pasture_tpu.pipeline import RegistrationPipeline


def test_pipeline_builds_consistent_map(rng):
    # scene + moving sensor
    u = rng.uniform(-6, 6, (1200, 2))
    z = np.sin(u[:, 0]) + 0.4 * np.cos(u[:, 1] * 1.3)
    scene = np.stack([u[:, 0], u[:, 1], z], axis=1)

    true_t = [np.asarray([0.6 * k, 0.25 * k, 0.0]) for k in range(5)]
    scans = [scene - t + rng.normal(0, 0.004, scene.shape) for t in true_t]

    pipe = RegistrationPipeline(voxel_size=0.05, keyframe_distance=0.3,
                                icp_iterations=25)
    for s in scans:
        pipe.add_scan(s)
    assert len(pipe.keyframes) == 5

    costs = pipe.optimize()
    traj = pipe.trajectory()
    expect = np.stack(true_t)
    np.testing.assert_allclose(traj, expect, atol=0.03)

    # merged map should be roughly scene-sized, not 5x
    mp = pipe.map_points()
    assert len(mp) < 2.0 * len(scene)

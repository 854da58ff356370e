"""Multiview fitting, textured-grid (texture-gradient) fitting, deferred
rendering and Loop subdivision sanity tests."""

import numpy as np

import deodr_tpu
from deodr_tpu.geometry.primitives import octahedron_mesh


def test_multiview_hand_fitting_converges():
    from examples.rgb_multiview_hand import run

    energies = run(max_iter=12)
    assert energies[-1] < 0.75 * energies[0]


def test_textured_grid_fitting_converges():
    from examples.textured_grid_fitting import run

    losses = run(max_iter=40, size=48)
    assert losses[-1] < 0.25 * losses[0]


def test_render_deferred_channels():
    import examples.render_mesh as rm

    channels = rm.example_channels(width=160, height=120)
    assert set(channels.keys()) == {"depth", "face_id", "barycentric", "normal", "luminosity", "xyz", "uv"}
    face_id = channels["face_id"][:, :, 0]
    mask = channels["barycentric"].sum(axis=2) > 0.5
    assert mask.any()
    # barycentric coordinates sum to one on covered pixels
    np.testing.assert_allclose(channels["barycentric"].sum(axis=2)[mask], 1.0, atol=1e-6)
    # face ids are integers within range
    fids = face_id[mask]
    np.testing.assert_allclose(fids, np.round(fids), atol=1e-6)
    assert fids.max() < 4212
    # depth channel: background holds max depth
    assert channels["depth"][~mask].std() < 1e-6


def test_loop_subdivision_preserves_topology():
    mesh = octahedron_mesh(0)
    sub = mesh.subdivise(1)
    assert sub.nb_faces == 4 * mesh.nb_faces
    assert sub.nb_vertices == mesh.nb_vertices + mesh.adjacencies.nb_edges
    assert sub.adjacencies.is_closed
    # subdivision surface volume approaches the limit surface from inside
    assert 0 < float(sub.compute_volume()) < float(mesh.compute_volume()) * 1.5


def test_laplacian_energy_gradient():
    import jax.numpy as jnp

    from deodr_tpu.geometry.energy import LaplacianRigidEnergy

    mesh = octahedron_mesh(1)
    v0 = np.asarray(mesh.vertices)
    energy = LaplacianRigidEnergy(mesh, v0, cregu=10.0)
    rng = np.random.RandomState(0)
    v = v0 + rng.randn(*v0.shape) * 0.1
    e, grad, hess_mv = energy.evaluate(jnp.asarray(v))
    # finite-difference check of the gradient
    eps = 1e-6
    for idx in [(0, 0), (3, 1), (7, 2)]:
        vp = v.copy()
        vp[idx] += eps
        vm = v.copy()
        vm[idx] -= eps
        fd = (float(energy.evaluate(jnp.asarray(vp))[0]) - float(energy.evaluate(jnp.asarray(vm))[0])) / (2 * eps)
        assert abs(fd - float(grad[idx])) < 1e-4 * max(1.0, abs(fd))


def test_depth_fitter_lbfgs_energy_converges():
    """MeshDepthFitterEnergy (optax.lbfgs) decreases the hand-depth energy
    (reference capability: pytorch MeshDepthFitterEnergy + torch LBFGS)."""
    from examples.depth_image_hand_fitting import run

    energies = run(max_iter=8, optimizer="lbfgs")
    assert energies[-1] < 0.6 * energies[0], energies

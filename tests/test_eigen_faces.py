"""Eigen-faces example: PCA texture coefficients fit through texture_b
(reference capability: deodr/examples/eigen_faces.py)."""

from examples.eigen_faces import run


def test_eigen_faces_converges():
    result = run(nb_iter=20)
    energies = result["energies"]
    assert energies[0] > 0
    # monotone-ish decrease: the PCA-coefficient + grid fit must cut the
    # rendering error at least in half in 20 iterations
    assert energies[-1] < 0.5 * energies[0], (energies[0], energies[-1])

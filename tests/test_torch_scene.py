"""Scene3DTorch / CameraTorch: the torch class surface must reproduce the
JAX Scene3D renders and gradients (the reference validates its pytorch
layer the same way — same model across backends, golden energies agree)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from deodr_tpu import Scene3D
from deodr_tpu.camera import default_camera
from deodr_tpu.geometry.primitives import octahedron_mesh
from deodr_tpu.interop.torch_scene import CameraTorch, Scene3DTorch


def _setup(sigma=1.0):
    mesh = octahedron_mesh(2)
    rot = np.array([[1.0, 0, 0], [0, -1, 0], [0, 0, -1]])
    cam = default_camera(64, 48, 60, np.asarray(mesh.vertices), rot)
    bg = np.array([0.1, 0.2, 0.3])
    light_dir = np.array([-0.5, 0.5, -0.5])
    ambient = 0.4
    return mesh, cam, bg, light_dir, ambient


def test_forward_matches_jax_scene3d():
    mesh, cam, bg, light_dir, ambient = _setup()
    sc = Scene3D(sigma=1.0)
    sc.set_mesh(mesh)
    sc.set_background_color(bg)
    sc.set_light(light_directional=light_dir, light_ambient=ambient)
    img_jax = sc.render(cam)

    ts = Scene3DTorch(sigma=1.0)
    ts.set_mesh(mesh)
    ts.set_background_color(bg)
    img_t = ts.render(
        CameraTorch.from_camera(cam),
        torch.as_tensor(np.asarray(mesh.vertices), dtype=torch.float64),
        vertices_colors=torch.as_tensor(np.asarray(mesh.vertices_colors), dtype=torch.float64),
        light_directional=torch.as_tensor(light_dir, dtype=torch.float64),
        light_ambient=ambient,
    )
    np.testing.assert_allclose(img_t.numpy(), np.asarray(img_jax), rtol=1e-9, atol=1e-9)


def test_gradients_match_jax_scene3d():
    mesh, cam, bg, light_dir, ambient = _setup()
    w = np.random.RandomState(0).rand(48, 64, 3)

    # torch gradients through the full chain
    v = torch.as_tensor(np.asarray(mesh.vertices), dtype=torch.float64, ).requires_grad_()
    c = torch.as_tensor(np.asarray(mesh.vertices_colors), dtype=torch.float64).requires_grad_()
    ld = torch.as_tensor(light_dir, dtype=torch.float64).requires_grad_()
    la = torch.tensor(ambient, dtype=torch.float64, requires_grad=True)
    ts = Scene3DTorch(sigma=1.0)
    ts.set_mesh(mesh)
    ts.set_background_color(bg)
    img_t = ts.render(CameraTorch.from_camera(cam), v, vertices_colors=c,
                      light_directional=ld, light_ambient=la)
    (img_t * torch.as_tensor(w)).sum().backward()

    # JAX reference gradients via the OO backward API
    sc = Scene3D(sigma=1.0)
    sc.set_mesh(mesh)
    sc.set_background_color(bg)
    sc.set_light(light_directional=light_dir, light_ambient=ambient)
    sc.render(cam)
    sc.render_backward(w)

    np.testing.assert_allclose(v.grad.numpy(), np.asarray(mesh._vertices_b), rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(c.grad.numpy(), np.asarray(mesh.vertices_colors_b), rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(ld.grad.numpy(), np.asarray(sc.light_directional_b), rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(float(la.grad), sc.light_ambient_b, rtol=1e-7)


def test_textured_render_and_texture_gradients():
    from deodr_tpu import ColoredTriMesh

    rng = np.random.RandomState(3)
    mesh = octahedron_mesh(1)
    # give it a texture atlas + per-vertex uv
    uv = rng.rand(mesh.nb_vertices, 2) * 6 + 1
    texture = rng.rand(8, 8, 3)
    tmesh = ColoredTriMesh(
        np.asarray(mesh.faces), np.asarray(mesh.vertices),
        uv=uv, texture=texture, faces_uv=np.asarray(mesh.faces),
    )
    rot = np.array([[1.0, 0, 0], [0, -1, 0], [0, 0, -1]])
    cam = default_camera(48, 40, 60, np.asarray(tmesh.vertices), rot)

    ts = Scene3DTorch(sigma=1.0)
    ts.set_mesh(tmesh)
    ts.set_background_color(np.array([0.2, 0.2, 0.2]))
    v = torch.as_tensor(np.asarray(tmesh.vertices), dtype=torch.float64).requires_grad_()
    uv_t = torch.as_tensor(uv, dtype=torch.float64).requires_grad_()
    tex_t = torch.as_tensor(texture, dtype=torch.float64).requires_grad_()
    ld = torch.as_tensor(np.array([-0.4, -0.4, -0.8]), dtype=torch.float64)
    img = ts.render(CameraTorch.from_camera(cam), v, light_directional=ld,
                    light_ambient=0.5, uv=uv_t, texture=tex_t)
    img.sum().backward()
    assert np.isfinite(v.grad.numpy()).all()
    assert np.isfinite(uv_t.grad.numpy()).all()
    g_tex = tex_t.grad.numpy()
    assert np.isfinite(g_tex).all() and np.abs(g_tex).sum() > 0

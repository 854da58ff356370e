// Runs the reference DEODR C++ core's forward AND adjoint (renderScene /
// renderScene_B, reference: C++/DifferentiableRenderer.h:2717,:2903) on a
// dumped 2.5D scene and writes every gradient buffer to disk, so the JAX
// renderer's jax.vjp gradients can be differential-tested against the
// reference's hand-written adjoint (the BASELINE.md acceptance criterion:
// "images and pixel gradients allclose"). Includes the reference header in
// place (never copied into this repo).
//
// Input files (little-endian flat dumps, see tools/ref_grad.py):
//   <stem>.meta   : int32 [T, V, Vuv, H, W, C, th, tw]
//   <stem>.faces .faces_uv : uint32 (T*3)
//   <stem>.ij f64 (V*2)  .depths f64 (V)  .uv f64 (Vuv*2)  .shade f64 (V)
//   <stem>.colors f64 (V*C)
//   <stem>.flags  : uint8 (T*3 edgeflags, T textured, T shaded)
//   <stem>.texture f64 (th*tw*C)
//   <stem>.cfg    : int32 [clockwise, strict_edge, integer_pixel_centers,
//                          antialiase_error, has_bg_image]
//   <stem>.bg     : f64 (C) when !has_bg_image, else <stem>.bgimg f64 (H*W*C)
//   image mode:   <stem>.imageb f64 (H*W*C) adjoint seed
//   error mode:   <stem>.obs f64 (H*W*C), <stem>.errb f64 (H*W) seed
//
// Outputs:
//   <stem>.out_image f64 (H*W*C)   forward image (pre-backward copy)
//   <stem>.out_zbuffer f64 (H*W)
//   <stem>.out_err f64 (H*W)       error mode only
//   <stem>.out_ijb (V*2)  .out_colorsb (V*C)  .out_uvb (Vuv*2)
//   <stem>.out_shadeb (V) .out_textureb (th*tw*C)
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <climits>
#include <limits>
#include <algorithm>

#include "DifferentiableRenderer.h"

template <typename T>
static std::vector<T> load(const std::string& path, size_t n) {
  std::vector<T> v(n);
  FILE* f = fopen(path.c_str(), "rb");
  if (!f || fread(v.data(), sizeof(T), n, f) != n) {
    fprintf(stderr, "failed reading %s\n", path.c_str());
    exit(1);
  }
  fclose(f);
  return v;
}

static void dump(const std::string& path, const double* p, size_t n) {
  FILE* f = fopen(path.c_str(), "wb");
  if (!f || fwrite(p, sizeof(double), n, f) != n) {
    fprintf(stderr, "failed writing %s\n", path.c_str());
    exit(1);
  }
  fclose(f);
}

int main(int argc, char** argv) {
  const std::string stem = argc > 1 ? argv[1] : "/tmp/ref_grad_scene";
  const double sigma = argc > 2 ? atof(argv[2]) : 1.0;

  auto meta = load<int>(stem + ".meta", 8);
  const int T = meta[0], V = meta[1], Vuv = meta[2], H = meta[3], W = meta[4],
            C = meta[5], th = meta[6], tw = meta[7];
  auto cfg = load<int>(stem + ".cfg", 5);
  const bool clockwise = cfg[0], strict_edge = cfg[1], integer_centers = cfg[2],
             antialiase_error = cfg[3], has_bg_image = cfg[4];

  auto faces = load<unsigned int>(stem + ".faces", 3 * (size_t)T);
  auto faces_uv = load<unsigned int>(stem + ".faces_uv", 3 * (size_t)T);
  auto ij = load<double>(stem + ".ij", 2 * (size_t)V);
  auto depths = load<double>(stem + ".depths", V);
  auto uv = load<double>(stem + ".uv", 2 * (size_t)Vuv);
  auto shade = load<double>(stem + ".shade", V);
  auto colors = load<double>(stem + ".colors", (size_t)V * C);
  auto flags = load<unsigned char>(stem + ".flags", 5 * (size_t)T);
  auto texture = load<double>(stem + ".texture", (size_t)th * tw * C);

  std::vector<double> bg, bgimg;
  if (has_bg_image)
    bgimg = load<double>(stem + ".bgimg", (size_t)H * W * C);
  else
    bg = load<double>(stem + ".bg", C);

  std::vector<bool> dummy;  // (avoid vector<bool>: need raw bool*)
  bool* edgeflags = new bool[3 * (size_t)T];
  bool* textured = new bool[T];
  bool* shaded = new bool[T];
  for (size_t i = 0; i < 3 * (size_t)T; ++i) edgeflags[i] = flags[i];
  for (int i = 0; i < T; ++i) textured[i] = flags[3 * (size_t)T + i];
  for (int i = 0; i < T; ++i) shaded[i] = flags[4 * (size_t)T + i];

  std::vector<double> uv_b(2 * (size_t)Vuv, 0.0), ij_b(2 * (size_t)V, 0.0),
      shade_b(V, 0.0), colors_b((size_t)V * C, 0.0),
      texture_b((size_t)th * tw * C, 0.0);

  Scene scene;
  scene.faces = faces.data();
  scene.faces_uv = faces_uv.data();
  scene.depths = depths.data();
  scene.uv = uv.data();
  scene.ij = ij.data();
  scene.shade = shade.data();
  scene.colors = colors.data();
  scene.edgeflags = edgeflags;
  scene.textured = textured;
  scene.shaded = shaded;
  scene.nb_triangles = T;
  scene.nb_vertices = V;
  scene.clockwise = clockwise;
  scene.backface_culling = true;
  scene.nb_uv = Vuv;
  scene.height = H;
  scene.width = W;
  scene.nb_colors = C;
  scene.texture = texture.data();
  scene.texture_height = th;
  scene.texture_width = tw;
  scene.background_image = has_bg_image ? bgimg.data() : NULL;
  scene.background_color = has_bg_image ? NULL : bg.data();
  scene.uv_b = uv_b.data();
  scene.ij_b = ij_b.data();
  scene.shade_b = shade_b.data();
  scene.colors_b = colors_b.data();
  scene.texture_b = texture_b.data();
  scene.strict_edge = strict_edge;
  scene.perspective_correct = false;
  scene.integer_pixel_centers = integer_centers;

  std::vector<double> image((size_t)H * W * C, 0.0), z_buffer((size_t)H * W, 0.0);

  if (antialiase_error) {
    auto obs = load<double>(stem + ".obs", (size_t)H * W * C);
    auto err_b = load<double>(stem + ".errb", (size_t)H * W);
    std::vector<double> err_buffer((size_t)H * W, 0.0);
    renderScene(scene, image.data(), z_buffer.data(), sigma, true, obs.data(),
                err_buffer.data());
    dump(stem + ".out_image", image.data(), image.size());
    dump(stem + ".out_zbuffer", z_buffer.data(), z_buffer.size());
    dump(stem + ".out_err", err_buffer.data(), err_buffer.size());
    // renderScene_B un-blends err_buffer in place; like the reference
    // Scene2D.render_error_backward(make_copies=True) we hand it copies
    std::vector<double> err_copy = err_buffer;
    renderScene_B(scene, image.data(), z_buffer.data(), NULL, sigma, true,
                  obs.data(), err_copy.data(), err_b.data());
  } else {
    auto image_b = load<double>(stem + ".imageb", (size_t)H * W * C);
    renderScene(scene, image.data(), z_buffer.data(), sigma, false, NULL, NULL);
    dump(stem + ".out_image", image.data(), image.size());
    dump(stem + ".out_zbuffer", z_buffer.data(), z_buffer.size());
    std::vector<double> image_copy = image;
    renderScene_B(scene, image_copy.data(), z_buffer.data(), image_b.data(),
                  sigma, false, NULL, NULL, NULL);
  }

  dump(stem + ".out_ijb", ij_b.data(), ij_b.size());
  dump(stem + ".out_colorsb", colors_b.data(), colors_b.size());
  dump(stem + ".out_uvb", uv_b.data(), uv_b.size());
  dump(stem + ".out_shadeb", shade_b.data(), shade_b.size());
  dump(stem + ".out_textureb", texture_b.data(), texture_b.size());
  printf("{\"stem\":\"%s\",\"sigma\":%g,\"mode\":\"%s\"}\n", stem.c_str(), sigma,
         antialiase_error ? "error" : "image");
  return 0;
}

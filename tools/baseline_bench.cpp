// Measures the reference DEODR C++ core's single-core rasterization
// throughput, to anchor bench.py's vs_baseline ratio. Includes the
// reference header in place (never copied into this repo).
//
// Scene mirrors the reference microbenchmark (reference:
// tests/benchmark_rendering.py): 200 random untextured triangles,
// 500x500, plus a 512x512 variant and forward+backward timing.
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <climits>
#include <limits>
#include <algorithm>
#include <vector>

#include "DifferentiableRenderer.h"

int main(int argc, char** argv) {
  const int height = argc > 1 ? atoi(argv[1]) : 512;
  const int width = argc > 2 ? atoi(argv[2]) : 512;
  const int n_tri = argc > 3 ? atoi(argv[3]) : 200;
  const double sigma = argc > 4 ? atof(argv[4]) : 0.0;
  const int reps = argc > 5 ? atoi(argv[5]) : 50;

  const int nv = 3 * n_tri;
  std::mt19937 gen(0);
  std::uniform_real_distribution<double> uni(0.0, 1.0);

  std::vector<unsigned int> faces(3 * n_tri), faces_uv(3 * n_tri);
  std::vector<double> ij(2 * nv), depths(nv), uv(2 * nv, 0.0), shade(nv, 0.0);
  std::vector<double> colors(3 * nv);
  std::vector<bool> edgeflags_v; bool* edgeflags = new bool[3*n_tri]; bool* textured = new bool[n_tri]; bool* shaded = new bool[n_tri];
  for (int i = 0; i < 3*n_tri; ++i) edgeflags[i] = true;
  for (int i = 0; i < n_tri; ++i) { textured[i] = false; shaded[i] = false; }
  for (int t = 0; t < n_tri; ++t) {
    double cx = uni(gen) * width, cy = uni(gen) * height;
    double d = uni(gen) + 0.5;
    for (int k = 0; k < 3; ++k) {
      int v = 3 * t + k;
      faces[3 * t + k] = v;
      faces_uv[3 * t + k] = v;
      ij[2 * v] = cx + (uni(gen) - 0.5) * 160;
      ij[2 * v + 1] = cy + (uni(gen) - 0.5) * 160;
      depths[v] = d;
      for (int c = 0; c < 3; ++c) colors[3 * v + c] = uni(gen);
    }
    // wind so signedArea(ij, clockwise=false) > 0
    double ux = ij[2 * (3 * t + 1)] - ij[2 * (3 * t)];
    double uy = ij[2 * (3 * t + 1) + 1] - ij[2 * (3 * t) + 1];
    double vx = ij[2 * (3 * t + 2)] - ij[2 * (3 * t)];
    double vy = ij[2 * (3 * t + 2) + 1] - ij[2 * (3 * t) + 1];
    if (ux * vy - vx * uy > 0) {
      std::swap(faces[3 * t + 1], faces[3 * t + 2]);
      std::swap(faces_uv[3 * t + 1], faces_uv[3 * t + 2]);
    }
  }
  std::vector<double> texture(3, 0.0), background_color{0.3, 0.5, 0.7};
  std::vector<double> ij_b(2 * nv, 0.0), uv_b(2 * nv, 0.0), shade_b(nv, 0.0);
  std::vector<double> colors_b(3 * nv, 0.0), texture_b(3, 0.0);

  Scene scene;
  std::memset(&scene, 0, sizeof(scene));
  scene.nb_triangles = n_tri;
  scene.nb_vertices = nv;
  scene.nb_uv = nv;
  scene.faces = faces.data();
  scene.faces_uv = faces_uv.data();
  scene.ij = ij.data();
  scene.depths = depths.data();
  scene.uv = uv.data();
  scene.shade = shade.data();
  scene.colors = colors.data();
  scene.edgeflags = edgeflags;
  scene.textured = textured;
  scene.shaded = shaded;
  scene.nb_colors = 3;
  scene.texture = texture.data();
  scene.texture_height = 1;
  scene.texture_width = 1;
  scene.background_image = nullptr;
  scene.background_color = background_color.data();
  scene.height = height;
  scene.width = width;
  scene.clockwise = false;
  scene.backface_culling = true;
  scene.strict_edge = true;
  scene.perspective_correct = false;
  scene.integer_pixel_centers = true;
  scene.ij_b = ij_b.data();
  scene.uv_b = uv_b.data();
  scene.shade_b = shade_b.data();
  scene.colors_b = colors_b.data();
  scene.texture_b = texture_b.data();

  std::vector<double> image(height * width * 3), z_buffer(height * width);
  std::vector<double> image_b(height * width * 3, 1e-3);

  // warmup + forward timing
  renderScene(scene, image.data(), z_buffer.data(), sigma);
  auto t0 = std::chrono::steady_clock::now();
  for (int r = 0; r < reps; ++r) renderScene(scene, image.data(), z_buffer.data(), sigma);
  auto t1 = std::chrono::steady_clock::now();
  double fwd = std::chrono::duration<double>(t1 - t0).count() / reps;

  // forward + backward timing
  t0 = std::chrono::steady_clock::now();
  for (int r = 0; r < reps; ++r) {
    renderScene(scene, image.data(), z_buffer.data(), sigma);
    std::vector<double> image_copy(image);
    renderScene_B(scene, image_copy.data(), z_buffer.data(), image_b.data(), sigma);
  }
  t1 = std::chrono::steady_clock::now();
  double fwdbwd = std::chrono::duration<double>(t1 - t0).count() / reps;

  double mpix = height * (double)width / 1e6;
  printf("{\"height\": %d, \"width\": %d, \"n_tri\": %d, \"sigma\": %g, "
         "\"fwd_ms\": %.3f, \"fwd_mpix_s\": %.2f, \"fwdbwd_ms\": %.3f, \"fwdbwd_mpix_s\": %.2f}\n",
         height, width, n_tri, sigma, fwd * 1e3, mpix / fwd, fwdbwd * 1e3, mpix / fwdbwd);
  return 0;
}

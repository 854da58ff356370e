// Measures the reference DEODR C++ core's single-core throughput on a real
// textured mesh scene (the duck example), forward and forward+backward,
// to anchor the textured-path comparisons in PERFORMANCE.md. Includes the
// reference header in place (never copied into this repo).
//
// Reads flat little-endian dumps produced by tools/dump_scene.py:
//   <stem>.meta   : int32 [nb_triangles, nb_vertices, nb_uv, height, width,
//                         nb_colors, tex_h, tex_w]
//   <stem>.faces  : uint32 (T*3)        <stem>.faces_uv : uint32 (T*3)
//   <stem>.ij     : f64 (V*2)           <stem>.depths   : f64 (V)
//   <stem>.uv     : f64 (Vuv*2)         <stem>.shade    : f64 (V)
//   <stem>.colors : f64 (V*C)           <stem>.flags    : uint8 (T*3 edge,
//                                        then T textured, then T shaded)
//   <stem>.texture: f64 (th*tw*C)       <stem>.bg       : f64 (C)
#include <chrono>
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

int main(int argc, char** argv) {
  const std::string stem = argc > 1 ? argv[1] : "/tmp/duck_scene";
  const double sigma = argc > 2 ? atof(argv[2]) : 1.0;
  const int reps = argc > 3 ? atoi(argv[3]) : 30;

  auto meta = load<int>(stem + ".meta", 8);
  const int T = meta[0], V = meta[1], Vuv = meta[2], H = meta[3], W = meta[4],
            C = meta[5], th = meta[6], tw = meta[7];

  auto faces = load<unsigned int>(stem + ".faces", 3 * T);
  auto faces_uv = load<unsigned int>(stem + ".faces_uv", 3 * T);
  auto ij = load<double>(stem + ".ij", 2 * V);
  auto depths = load<double>(stem + ".depths", V);
  auto uv = load<double>(stem + ".uv", 2 * Vuv);
  auto shade = load<double>(stem + ".shade", V);
  auto colors = load<double>(stem + ".colors", (size_t)V * C);
  auto flags = load<unsigned char>(stem + ".flags", 3 * (size_t)T + 2 * (size_t)T);
  auto texture = load<double>(stem + ".texture", (size_t)th * tw * C);
  auto bg = load<double>(stem + ".bg", C);

  bool* edgeflags = new bool[3 * T];
  bool* textured = new bool[T];
  bool* shaded = new bool[T];
  for (int i = 0; i < 3 * T; ++i) edgeflags[i] = flags[i];
  for (int i = 0; i < T; ++i) textured[i] = flags[3 * T + i];
  for (int i = 0; i < T; ++i) shaded[i] = flags[4 * T + i];

  std::vector<double> uv_b(2 * Vuv, 0.0), ij_b(2 * V, 0.0), shade_b(V, 0.0);
  std::vector<double> colors_b((size_t)V * C, 0.0), texture_b((size_t)th * tw * C, 0.0);

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
  scene.clockwise = false;
  scene.backface_culling = true;
  scene.nb_uv = Vuv;
  scene.height = H;
  scene.width = W;
  scene.nb_colors = C;
  scene.texture = texture.data();
  scene.texture_height = th;
  scene.texture_width = tw;
  scene.background_image = NULL;
  scene.background_color = bg.data();
  scene.uv_b = uv_b.data();
  scene.ij_b = ij_b.data();
  scene.shade_b = shade_b.data();
  scene.colors_b = colors_b.data();
  scene.texture_b = texture_b.data();
  scene.strict_edge = true;
  scene.perspective_correct = false;
  scene.integer_pixel_centers = true;

  std::vector<double> image((size_t)H * W * C), z_buffer((size_t)H * W);
  std::vector<double> image_b((size_t)H * W * C, 1.0);

  double best_f = 1e18, best_fb = 1e18;
  for (int r = 0; r < reps; ++r) {
    auto t0 = std::chrono::high_resolution_clock::now();
    renderScene(scene, image.data(), z_buffer.data(), sigma);
    auto t1 = std::chrono::high_resolution_clock::now();
    best_f = std::min(best_f, std::chrono::duration<double>(t1 - t0).count());
  }
  for (int r = 0; r < reps; ++r) {
    std::fill(image_b.begin(), image_b.end(), 1.0);
    auto t0 = std::chrono::high_resolution_clock::now();
    renderScene(scene, image.data(), z_buffer.data(), sigma);
    renderScene_B(scene, image.data(), z_buffer.data(), image_b.data(), sigma);
    auto t1 = std::chrono::high_resolution_clock::now();
    best_fb = std::min(best_fb, std::chrono::duration<double>(t1 - t0).count());
  }
  const double mp = (double)H * W / 1e6;
  printf("{\"scene\":\"%s\",\"sigma\":%g,\"fwd_ms\":%.2f,\"fwdbwd_ms\":%.2f,"
         "\"fwd_mpix_s\":%.1f,\"fwdbwd_mpix_s\":%.1f}\n",
         stem.c_str(), sigma, best_f * 1e3, best_fb * 1e3, mp / best_f, mp / best_fb);
  return 0;
}

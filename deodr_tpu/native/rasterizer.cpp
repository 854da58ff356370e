// Native CPU reference rasterizer (forward only).
//
// An independent C++ implementation of this framework's rasterization
// semantics — the per-pixel coverage predicate, z-argmin visibility with
// lowest-index tie-breaking, affine attribute maps, integer-texel bilinear
// sampling and the back-to-front discontinuity-edge-overdraw pass — used as
// a cross-language oracle for the JAX/Pallas implementations and as a fast
// single-machine CPU fallback. It follows this repo's formulation
// (deodr_tpu/ops/raster.py, ops/edge_aa.py), not the reference scanline
// code; semantics match the conventions in README.md.
//
// Build: g++ -O3 -shared -fPIC -o librasterizer.so rasterizer.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

struct Scene {
  const int32_t* faces;     // (T, 3)
  const int32_t* faces_uv;  // (T, 3)
  const double* ij;         // (V, 2) x, y
  const double* depths;     // (V,)
  const double* uv;         // (Vuv, 2)
  const double* shade;      // (V,)
  const double* colors;     // (V, C)
  const uint8_t* edgeflags;  // (T, 3)
  const uint8_t* textured;   // (T,)
  const uint8_t* shaded;     // (T,)
  const double* texture;     // (th, tw, C) or null
  const double* background;  // (C,) color
  int32_t nb_tri, nb_vert, nb_uv, nb_colors, height, width, tex_h, tex_w;
  uint8_t clockwise, backface_culling, strict_edge, integer_pixel_centers;
  double sigma;
};

// min(hi, max(lo, floor(num/den))) with den==0 -> (num <= 0 ? hi : lo)
double floor_div(double num, double den, double lo, double hi) {
  if (den == 0) return num <= 0 ? hi : lo;
  double q = std::floor(num / den);
  return std::min(hi, std::max(lo, q));
}

double ceil_div(double num, double den, double lo, double hi) {
  if (den == 0) return num < 0 ? hi : lo;
  double q = std::ceil(num / den);
  return std::min(hi, std::max(lo, q));
}

bool inv3x3(const double m[9], double out[9]) {
  double c00 = m[4] * m[8] - m[5] * m[7];
  double c10 = m[5] * m[6] - m[3] * m[8];
  double c20 = m[3] * m[7] - m[4] * m[6];
  double det = m[0] * c00 + m[1] * c10 + m[2] * c20;
  if (det == 0 || !std::isfinite(det)) return false;
  double inv_det = 1.0 / det;
  out[0] = c00 * inv_det;
  out[1] = (m[2] * m[7] - m[1] * m[8]) * inv_det;
  out[2] = (m[1] * m[5] - m[2] * m[4]) * inv_det;
  out[3] = c10 * inv_det;
  out[4] = (m[0] * m[8] - m[2] * m[6]) * inv_det;
  out[5] = (m[2] * m[3] - m[0] * m[5]) * inv_det;
  out[6] = c20 * inv_det;
  out[7] = (m[1] * m[6] - m[0] * m[7]) * inv_det;
  out[8] = (m[0] * m[4] - m[1] * m[3]) * inv_det;
  return true;
}

void bilinear(const Scene& s, double u, double v, double* out) {
  int tw = s.tex_w, th = s.tex_h, c = s.nb_colors;
  double fu = std::floor(u), fv = std::floor(v);
  double eu = u - fu, ev = v - fv;
  if (fu < 0) { fu = 0; eu = 0; }
  if (fu > tw - 2) { fu = tw - 2; eu = 1; }
  if (fv < 0) { fv = 0; ev = 0; }
  if (fv > th - 2) { fv = th - 2; ev = 1; }
  int iu = (int)fu, iv = (int)fv;
  const double* t00 = s.texture + (iv * tw + iu) * c;
  const double* t10 = s.texture + (iv * tw + iu + 1) * c;
  const double* t01 = s.texture + ((iv + 1) * tw + iu) * c;
  const double* t11 = s.texture + ((iv + 1) * tw + iu + 1) * c;
  for (int k = 0; k < c; ++k)
    out[k] = ((1 - eu) * t00[k] + eu * t10[k]) * (1 - ev) + ((1 - eu) * t01[k] + eu * t11[k]) * ev;
}

struct TriSetup {
  double eq[3][3];       // edge equations, interior positive
  double y_lo[2], y_hi[2];
  int left_id[2], right_id[2];
  double x_lo, x_hi;
  double bary[9];        // (x, y, 1) -> barycentric
  bool valid;
  double vx[3], vy[3], vz[3];
};

bool setup_triangle(const Scene& s, int t, double off, TriSetup& out) {
  const int32_t* f = s.faces + 3 * t;
  for (int k = 0; k < 3; ++k) {
    out.vx[k] = s.ij[2 * f[k]] - off;
    out.vy[k] = s.ij[2 * f[k] + 1] - off;
    out.vz[k] = s.depths[f[k]];
  }
  double ux = out.vx[1] - out.vx[0], uy = out.vy[1] - out.vy[0];
  double wx = out.vx[2] - out.vx[0], wy = out.vy[2] - out.vy[0];
  bool local_cw = (ux * wy - wx * uy) > 0;
  for (int k = 0; k < 3; ++k) {
    int k2 = (k + 1) % 3;
    double a = out.vy[k] - out.vy[k2];
    double b = out.vx[k2] - out.vx[k];
    if (!local_cw) { a = -a; b = -b; }
    out.eq[k][0] = a;
    out.eq[k][1] = b;
    out.eq[k][2] = -0.5 * (a * (out.vx[k] + out.vx[k2]) + b * (out.vy[k] + out.vy[k2]));
  }
  int order[3] = {0, 1, 2};
  std::sort(order, order + 3, [&](int a, int b) { return out.vy[a] < out.vy[b]; });
  double ys[3] = {out.vy[order[0]], out.vy[order[1]], out.vy[order[2]]};
  double xs[3] = {out.vx[0], out.vx[1], out.vx[2]};
  std::sort(xs, xs + 3);
  if (s.strict_edge) {
    out.y_lo[0] = std::floor(ys[0]) + 1;
    out.y_lo[1] = std::floor(ys[1]) + 1;
    out.x_lo = std::floor(xs[0]);
  } else {
    out.y_lo[0] = std::ceil(ys[0]);
    out.y_lo[1] = std::ceil(ys[1]);
    out.x_lo = std::ceil(xs[0]);
  }
  out.y_hi[0] = std::floor(ys[1]);
  out.y_hi[1] = std::floor(ys[2]);
  out.x_hi = std::floor(xs[2]);
  out.y_lo[0] = std::max(out.y_lo[0], 0.0);
  out.y_lo[1] = std::max(out.y_lo[1], 0.0);
  out.y_hi[0] = std::min(out.y_hi[0], (double)(s.height - 1));
  out.y_hi[1] = std::min(out.y_hi[1], (double)(s.height - 1));
  out.x_lo = std::max(out.x_lo, 0.0);
  out.x_hi = std::min(out.x_hi, (double)(s.width - 1));

  int id0 = order[0], id2 = order[2];
  if (out.eq[id0][0] > 0) { out.left_id[0] = id0; out.right_id[0] = (id0 + 2) % 3; }
  else { out.left_id[0] = (id0 + 2) % 3; out.right_id[0] = id0; }
  if (out.eq[id2][0] < 0) { out.right_id[1] = id2; out.left_id[1] = (id2 + 2) % 3; }
  else { out.right_id[1] = (id2 + 2) % 3; out.left_id[1] = id2; }

  double m[9] = {out.vx[0], out.vx[1], out.vx[2], out.vy[0], out.vy[1], out.vy[2], 1, 1, 1};
  out.valid = inv3x3(m, out.bary);
  return out.valid;
}

}  // namespace

extern "C" void render_scene_native(
    const int32_t* faces, const int32_t* faces_uv, const double* ij, const double* depths,
    const double* uv, const double* shade, const double* colors, const uint8_t* edgeflags,
    const uint8_t* textured, const uint8_t* shaded, const double* texture,
    const double* background_color, const double* background_image,
    int32_t nb_tri, int32_t nb_vert, int32_t nb_uv, int32_t nb_colors,
    int32_t height, int32_t width, int32_t tex_h, int32_t tex_w,
    uint8_t clockwise, uint8_t backface_culling, uint8_t strict_edge,
    uint8_t integer_pixel_centers, double sigma,
    double* image, double* z_buffer) {
  Scene s{faces, faces_uv, ij, depths, uv, shade, colors, edgeflags, textured, shaded,
          texture, background_color, nb_tri, nb_vert, nb_uv, nb_colors, height, width,
          tex_h, tex_w, clockwise, backface_culling, strict_edge, integer_pixel_centers, sigma};
  const double off = integer_pixel_centers ? 0.0 : 0.5;
  const int c = nb_colors;
  const double inf = std::numeric_limits<double>::infinity();

  for (int p = 0; p < height * width; ++p) {
    z_buffer[p] = inf;
    for (int k = 0; k < c; ++k)
      image[p * c + k] = background_image ? background_image[p * c + k] : background_color[k];
  }

  std::vector<double> area(nb_tri);
  std::vector<char> frontal(nb_tri);
  for (int t = 0; t < nb_tri; ++t) {
    const int32_t* f = faces + 3 * t;
    bool front = depths[f[0]] >= 0 && depths[f[1]] >= 0 && depths[f[2]] >= 0;
    double ux = ij[2 * f[1]] - ij[2 * f[0]], uy = ij[2 * f[1] + 1] - ij[2 * f[0] + 1];
    double wx = ij[2 * f[2]] - ij[2 * f[0]], wy = ij[2 * f[2] + 1] - ij[2 * f[0] + 1];
    double a = 0.5 * (ux * wy - wx * uy) * (clockwise ? 1.0 : -1.0);
    area[t] = front ? a : 0.0;
    frontal[t] = front;
  }

  std::vector<int> winner(height * width, -1);
  TriSetup ts;
  for (int t = 0; t < nb_tri; ++t) {
    bool draw = (area[t] > 0) || !backface_culling;
    draw = draw && (!textured[t] || shaded[t]);
    if (!draw) continue;
    if (!setup_triangle(s, t, off, ts)) continue;
    for (int part = 0; part < 2; ++part) {
      int yb = (int)ts.y_lo[part], ye = (int)ts.y_hi[part];
      const double* le = ts.eq[ts.left_id[part]];
      const double* re = ts.eq[ts.right_id[part]];
      for (int y = yb; y <= ye; ++y) {
        double lo = ts.x_lo - 1, hi = ts.x_hi;
        double tl = strict_edge ? 1 + floor_div(-(le[1] * y + le[2]), le[0], lo, hi)
                                : ceil_div(-(le[1] * y + le[2]), le[0], lo, hi);
        double tr = floor_div(-(re[1] * y + re[2]), re[0], lo, hi);
        int xb = (int)std::max(ts.x_lo, tl), xe = (int)std::min(ts.x_hi, tr);
        for (int x = xb; x <= xe; ++x) {
          double b0 = ts.bary[0] * x + ts.bary[1] * y + ts.bary[2];
          double b1 = ts.bary[3] * x + ts.bary[4] * y + ts.bary[5];
          double b2 = ts.bary[6] * x + ts.bary[7] * y + ts.bary[8];
          double z = b0 * ts.vz[0] + b1 * ts.vz[1] + b2 * ts.vz[2];
          int p = y * width + x;
          if (std::isfinite(z) && z < z_buffer[p]) {
            z_buffer[p] = z;
            winner[p] = t;
            const int32_t* f = faces + 3 * t;
            if (textured[t] && shaded[t]) {
              const int32_t* fu = faces_uv + 3 * t;
              double u = b0 * uv[2 * fu[0]] + b1 * uv[2 * fu[1]] + b2 * uv[2 * fu[2]];
              double v = b0 * uv[2 * fu[0] + 1] + b1 * uv[2 * fu[1] + 1] + b2 * uv[2 * fu[2] + 1];
              double lum = b0 * shade[f[0]] + b1 * shade[f[1]] + b2 * shade[f[2]];
              double tex[16];
              bilinear(s, u, v, tex);
              for (int k = 0; k < c; ++k) image[p * c + k] = tex[k] * lum;
            } else {
              for (int k = 0; k < c; ++k)
                image[p * c + k] = b0 * colors[f[0] * c + k] + b1 * colors[f[1] * c + k] +
                                   b2 * colors[f[2] * c + k];
            }
          }
        }
      }
    }
  }

  if (sigma <= 0) return;

  // edge-overdraw pass, back-to-front by triangle depth sum
  std::vector<double> depth_key(nb_tri);
  std::vector<int> order(nb_tri);
  for (int t = 0; t < nb_tri; ++t) {
    const int32_t* f = faces + 3 * t;
    depth_key[t] = depths[f[0]] + depths[f[1]] + depths[f[2]];
    order[t] = t;
  }
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return depth_key[a] > depth_key[b]; });
  static const int sub0[3] = {1, 2, 0}, sub1[3] = {0, 1, 2};
  for (int it = 0; it < nb_tri; ++it) {
    int t = order[it];
    if (!(area[t] > 0)) continue;
    const int32_t* f = faces + 3 * t;
    for (int n = 0; n < 3; ++n) {
      if (!edgeflags[3 * t + n]) continue;
      int i0 = f[sub0[n]], i1 = f[sub1[n]];
      double v0x = ij[2 * i0] - off, v0y = ij[2 * i0 + 1] - off;
      double v1x = ij[2 * i1] - off, v1y = ij[2 * i1 + 1] - off;
      double nx, ny;
      if (clockwise) { nx = v0y - v1y; ny = v1x - v0x; }
      else { nx = v1y - v0y; ny = v0x - v1x; }
      double nn = std::sqrt(nx * nx + ny * ny);
      if (nn == 0) continue;
      nx /= nn; ny /= nn;
      double m[9] = {v0x, v1x, nx, v0y, v1y, ny, 1, 1, 0};
      double inv[9];
      if (!inv3x3(m, inv)) continue;
      double tc[3] = {inv[6] / sigma, inv[7] / sigma, inv[8] / sigma};
      double ineq[4][3] = {
          {inv[0], inv[1], inv[2]},
          {inv[3], inv[4], inv[5]},
          {tc[0], tc[1], tc[2]},
          {-tc[0], -tc[1], 1 - tc[2]},
      };
      int yb = std::max((int)(std::floor(std::min(v0y, v1y) - sigma) + 1), 0);
      int ye = std::min((int)std::floor(std::max(v0y, v1y) + sigma), height - 1);
      for (int y = yb; y <= ye; ++y) {
        double xb = 0, xe = width - 1;
        for (int q = 0; q < 4; ++q) {
          double num = -(ineq[q][1] * y + ineq[q][2]);
          double fd = floor_div(num, ineq[q][0], xb - 1, xe + 1);
          if (ineq[q][0] < 0) xe = std::min(xe, fd);
          else xb = std::max(xb, 1 + fd);
        }
        for (int x = (int)xb; x <= (int)xe; ++x) {
          double b0 = inv[0] * x + inv[1] * y + inv[2];
          double b1 = inv[3] * x + inv[4] * y + inv[5];
          double tr = tc[0] * x + tc[1] * y + tc[2];
          double z = b0 * depths[i0] + b1 * depths[i1];
          int p = y * width + x;
          if (!(z < z_buffer[p])) continue;
          double a_col[16];
          if (textured[t] && shaded[t]) {
            const int32_t* fu = faces_uv + 3 * t;
            int u0 = fu[sub0[n]], u1 = fu[sub1[n]];
            double uu = b0 * uv[2 * u0] + b1 * uv[2 * u1];
            double vv = b0 * uv[2 * u0 + 1] + b1 * uv[2 * u1 + 1];
            double lum = b0 * shade[i0] + b1 * shade[i1];
            bilinear(s, uu, vv, a_col);
            for (int k = 0; k < c; ++k) a_col[k] *= lum;
          } else {
            for (int k = 0; k < c; ++k)
              a_col[k] = b0 * colors[i0 * c + k] + b1 * colors[i1 * c + k];
          }
          for (int k = 0; k < c; ++k)
            image[p * c + k] = tr * image[p * c + k] + (1 - tr) * a_col[k];
        }
      }
    }
  }
}

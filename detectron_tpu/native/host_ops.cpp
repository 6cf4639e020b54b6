// Native host-side geometry/mask ops for the data and eval pipelines.
//
// TPU-native replacement for the reference's compiled host layer
// (lib/utils/cython_nms.pyx, cython_bbox.pyx and the pycocotools C mask
// runtime it depends on): greedy NMS, pairwise IoU, COCO run-length mask
// encode/decode, polygon rasterization (COCO 5x-upsampled scanline scheme),
// and RLE mask IoU. Exposed through a plain C ABI consumed via ctypes
// (detectron_tpu/native/__init__.py); every function has a numpy reference
// twin that the tests compare against bit-for-bit.
//
// Build: g++ -O3 -fPIC -shared host_ops.cpp -o libhostops.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Greedy NMS. dets: (n, 5) [x1,y1,x2,y2,score]; keep (out): indices in
// descending-score order; returns number kept.
// ---------------------------------------------------------------------------
int nms(const float* dets, int n, float thresh, int* keep) {
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(), [dets](int a, int b) {
    return dets[a * 5 + 4] > dets[b * 5 + 4];
  });
  std::vector<double> areas(n);
  for (int i = 0; i < n; ++i) {
    const float* d = dets + i * 5;
    areas[i] = (double)(d[2] - d[0] + 1) * (double)(d[3] - d[1] + 1);
  }
  std::vector<char> suppressed(n, 0);
  int n_keep = 0;
  for (int oi = 0; oi < n; ++oi) {
    int i = order[oi];
    if (suppressed[i]) continue;
    keep[n_keep++] = i;
    const float* di = dets + i * 5;
    for (int oj = oi + 1; oj < n; ++oj) {
      int j = order[oj];
      if (suppressed[j]) continue;
      const float* dj = dets + j * 5;
      double xx1 = std::max(di[0], dj[0]);
      double yy1 = std::max(di[1], dj[1]);
      double xx2 = std::min(di[2], dj[2]);
      double yy2 = std::min(di[3], dj[3]);
      double w = std::max(0.0, xx2 - xx1 + 1);
      double h = std::max(0.0, yy2 - yy1 + 1);
      double inter = w * h;
      double ovr = inter / (areas[i] + areas[j] - inter);
      if (ovr > thresh) suppressed[j] = 1;
    }
  }
  return n_keep;
}

// ---------------------------------------------------------------------------
// Pairwise IoU with the Detectron +1 edge convention. out: (n, k) doubles.
// ---------------------------------------------------------------------------
void bbox_overlaps(const double* boxes, int n, const double* query, int k,
                   double* out) {
  for (int j = 0; j < k; ++j) {
    const double* q = query + j * 4;
    double qa = (q[2] - q[0] + 1) * (q[3] - q[1] + 1);
    for (int i = 0; i < n; ++i) {
      const double* b = boxes + i * 4;
      double iw = std::min(b[2], q[2]) - std::max(b[0], q[0]) + 1;
      double out_v = 0.0;
      if (iw > 0) {
        double ih = std::min(b[3], q[3]) - std::max(b[1], q[1]) + 1;
        if (ih > 0) {
          double ba = (b[2] - b[0] + 1) * (b[3] - b[1] + 1);
          double ua = ba + qa - iw * ih;
          out_v = iw * ih / ua;
        }
      }
      out[i * k + j] = out_v;
    }
  }
}

// ---------------------------------------------------------------------------
// RLE decode: counts -> column-major binary mask of h*w bytes.
// ---------------------------------------------------------------------------
int rle_decode(const uint32_t* counts, int m, uint8_t* mask, int hw) {
  int64_t p = 0;
  uint8_t v = 0;
  for (int i = 0; i < m; ++i) {
    int64_t c = counts[i];
    if (p + c > hw) return -1;
    std::memset(mask + p, v, c);
    p += c;
    v = 1 - v;
  }
  return p == hw ? 0 : -1;
}

// RLE encode: column-major mask bytes -> counts (caller buffer >= hw + 1).
// Returns count length m.
int rle_encode(const uint8_t* mask, int hw, uint32_t* counts) {
  int m = 0;
  uint8_t cur = 0;
  uint32_t run = 0;
  for (int i = 0; i < hw; ++i) {
    uint8_t v = mask[i] ? 1 : 0;
    if (v == cur) {
      ++run;
    } else {
      counts[m++] = run;
      cur = v;
      run = 1;
    }
  }
  counts[m++] = run;
  return m;
}

// ---------------------------------------------------------------------------
// Polygon -> RLE counts (COCO scheme: 5x upsample, boundary trace,
// downsample, parity fill). counts buffer must hold >= h*w + 2 entries.
// Returns count length m.
// ---------------------------------------------------------------------------
int poly_to_counts(const double* xy, int k, int h, int w, uint32_t* counts) {
  const double scale = 5.0;
  std::vector<int64_t> x(k + 1), y(k + 1);
  for (int j = 0; j < k; ++j) {
    x[j] = (int64_t)std::floor(scale * xy[2 * j] + 0.5);
    y[j] = (int64_t)std::floor(scale * xy[2 * j + 1] + 0.5);
  }
  x[k] = x[0];
  y[k] = y[0];

  // Trace integer boundary points along each edge.
  std::vector<int64_t> u, v;
  for (int j = 0; j < k; ++j) {
    int64_t xs = x[j], xe = x[j + 1], ys = y[j], ye = y[j + 1];
    int64_t dx = std::llabs(xe - xs);
    int64_t dy = std::llabs(ys - ye);
    bool flip = (dx >= dy && xs > xe) || (dx < dy && ys > ye);
    if (flip) {
      std::swap(xs, xe);
      std::swap(ys, ye);
    }
    if (dx >= dy) {
      double s = dx > 0 ? (double)(ye - ys) / dx : 0.0;
      for (int64_t d = 0; d <= dx; ++d) {
        int64_t t = flip ? xe - d : xs + d;
        u.push_back(t);
        v.push_back((int64_t)std::floor(ys + s * (t - xs) + 0.5));
      }
    } else {
      double s = dy > 0 ? (double)(xe - xs) / dy : 0.0;
      for (int64_t d = 0; d <= dy; ++d) {
        int64_t t = flip ? ye - d : ys + d;
        v.push_back(t);
        u.push_back((int64_t)std::floor(xs + s * (t - ys) + 0.5));
      }
    }
  }

  // Downsample to pixel-granularity vertical-boundary crossings.
  std::vector<int64_t> a;
  for (size_t j = 1; j < u.size(); ++j) {
    if (u[j] != u[j - 1]) {
      double xd = (double)std::min(u[j], u[j - 1]);
      xd = (xd + 0.5) / scale - 0.5;
      if (std::floor(xd) != xd || xd < 0 || xd > w - 1) continue;
      double yd = (double)std::min(v[j], v[j - 1]);
      yd = (yd + 0.5) / scale - 0.5;
      if (yd < 0) yd = 0;
      else if (yd > h) yd = h;
      yd = std::ceil(yd);
      a.push_back((int64_t)xd * h + (int64_t)yd);
    }
  }
  a.push_back((int64_t)h * w);
  std::sort(a.begin(), a.end());

  // Differences, then merge zero runs (double crossings cancel).
  int64_t prev = 0;
  for (size_t j = 0; j < a.size(); ++j) {
    int64_t t = a[j];
    a[j] -= prev;
    prev = t;
  }
  int m = 0;
  counts[m++] = (uint32_t)a[0];
  size_t j = 1;
  while (j < a.size()) {
    if (a[j] > 0) {
      counts[m++] = (uint32_t)a[j++];
    } else {
      ++j;
      if (j < a.size()) {
        counts[m - 1] += (uint32_t)a[j++];
      }
    }
  }
  return m;
}

// ---------------------------------------------------------------------------
// RLE-vs-RLE intersection area (counts co-iteration, no decode).
// ---------------------------------------------------------------------------
int64_t rle_intersection(const uint32_t* ca, int ma, const uint32_t* cb,
                         int mb) {
  int64_t inter = 0;
  int ia = 0, ib = 0;
  int64_t ra = ia < ma ? ca[ia] : 0;  // remaining in current a-run
  int64_t rb = ib < mb ? cb[ib] : 0;
  uint8_t va = 0, vb = 0;
  while (ia < ma && ib < mb) {
    int64_t step = std::min(ra, rb);
    if (va && vb) inter += step;
    ra -= step;
    rb -= step;
    if (ra == 0) {
      ++ia;
      va = 1 - va;
      if (ia < ma) ra = ca[ia];
    }
    if (rb == 0) {
      ++ib;
      vb = 1 - vb;
      if (ib < mb) rb = cb[ib];
    }
  }
  return inter;
}

}  // extern "C"

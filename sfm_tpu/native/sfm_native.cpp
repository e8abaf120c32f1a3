// Native host runtime for sfm_tpu: image decode, sequence prefetch,
// Delaunay triangulation, PLY export.
//
// Role: the host-side runtime pieces that the reference implements natively
// (demo/image_sequence.hh via png++, the vendored Triangle library used by
// Matcher::removeOutliers at matcher.cpp:1253-1256, demo/ply_exporter.cc).
// The TPU owns all compute; this code feeds it and handles the one
// pointer-chasing algorithm (Delaunay) that doesn't belong on an accelerator.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image). Build with
// build.py; Python falls back to PIL/scipy when the .so is absent.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// PGM + PNG decoding
// ---------------------------------------------------------------------------

// Returns 0 on success. Grayscale output (luma conversion for RGB PNGs).
int sfm_decode_image(const char *path, uint8_t *out, int out_capacity,
                     int *width, int *height);

// ---------------------------------------------------------------------------
// Delaunay (Bowyer-Watson, double precision, jittered)
// ---------------------------------------------------------------------------

// pts: [n*2] float. tris_out: [max_tris*3] int32. Returns triangle count,
// -1 on failure (caller falls back to qhull).
int sfm_delaunay(const float *pts, int n, int *tris_out, int max_tris);

// ---------------------------------------------------------------------------
// PLY export
// ---------------------------------------------------------------------------

int sfm_write_ply(const char *path, const double *pts, int n);
}

// ============================ image decoding ==============================

static int decode_pgm(FILE *f, uint8_t *out, int cap, int *w, int *h) {
    char magic[3] = {0};
    int maxv = 0;
    if (fscanf(f, "%2s %d %d %d", magic, w, h, &maxv) != 4) return 1;
    if (strcmp(magic, "P5") != 0 || maxv != 255) return 2;
    fgetc(f);
    size_t n = size_t(*w) * size_t(*h);
    if ((int)n > cap) return 3;
    return fread(out, 1, n, f) == n ? 0 : 4;
}

static uint32_t rd32(const uint8_t *p) {
    return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
           (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

static int paeth(int a, int b, int c) {
    int p = a + b - c, pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
    if (pa <= pb && pa <= pc) return a;
    if (pb <= pc) return b;
    return c;
}

static int decode_png(FILE *f, uint8_t *out, int cap, int *w, int *h) {
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf(sz);
    if (fread(buf.data(), 1, sz, f) != (size_t)sz) return 1;
    static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    if (sz < 8 || memcmp(buf.data(), sig, 8) != 0) return 2;

    int width = 0, height = 0, bit_depth = 0, color = 0, interlace = 0;
    std::vector<uint8_t> idat;
    for (long off = 8; off + 8 <= sz;) {
        uint32_t len = rd32(&buf[off]);
        const char *type = (const char *)&buf[off + 4];
        const uint8_t *data = &buf[off + 8];
        if (off + 12 + (long)len > sz) return 3;
        if (memcmp(type, "IHDR", 4) == 0) {
            width = rd32(data);
            height = rd32(data + 4);
            bit_depth = data[8];
            color = data[9];
            interlace = data[12];
        } else if (memcmp(type, "IDAT", 4) == 0) {
            idat.insert(idat.end(), data, data + len);
        } else if (memcmp(type, "IEND", 4) == 0) {
            break;
        }
        off += 12 + len;
    }
    if (bit_depth != 8 || interlace != 0) return 4;  // keep it simple
    int channels;
    switch (color) {
        case 0: channels = 1; break;  // gray
        case 2: channels = 3; break;  // rgb
        case 4: channels = 2; break;  // gray+alpha
        case 6: channels = 4; break;  // rgba
        default: return 5;            // palette unsupported
    }
    size_t stride = size_t(width) * channels;
    std::vector<uint8_t> raw((stride + 1) * height);
    uLongf raw_len = raw.size();
    if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK)
        return 6;
    if ((int)(size_t(width) * height) > cap) return 7;

    std::vector<uint8_t> prev(stride, 0), cur(stride);
    for (int y = 0; y < height; y++) {
        const uint8_t *row = &raw[y * (stride + 1)];
        int filter = row[0];
        const uint8_t *src = row + 1;
        for (size_t x = 0; x < stride; x++) {
            int a = x >= (size_t)channels ? cur[x - channels] : 0;
            int b = prev[x];
            int c = x >= (size_t)channels ? prev[x - channels] : 0;
            int v = src[x];
            switch (filter) {
                case 0: break;
                case 1: v += a; break;
                case 2: v += b; break;
                case 3: v += (a + b) / 2; break;
                case 4: v += paeth(a, b, c); break;
                default: return 8;
            }
            cur[x] = uint8_t(v);
        }
        uint8_t *dst = out + size_t(y) * width;
        if (channels == 1) {
            memcpy(dst, cur.data(), width);
        } else if (channels == 2) {
            for (int x = 0; x < width; x++) dst[x] = cur[x * 2];
        } else {
            for (int x = 0; x < width; x++) {
                const uint8_t *px = &cur[x * channels];
                dst[x] = uint8_t((299 * px[0] + 587 * px[1] + 114 * px[2]) / 1000);
            }
        }
        std::swap(prev, cur);
    }
    *w = width;
    *h = height;
    return 0;
}

int sfm_decode_image(const char *path, uint8_t *out, int cap, int *w, int *h) {
    FILE *f = fopen(path, "rb");
    if (!f) return -1;
    int c0 = fgetc(f);
    fseek(f, 0, SEEK_SET);
    int rc;
    if (c0 == 'P') rc = decode_pgm(f, out, cap, w, h);
    else rc = decode_png(f, out, cap, w, h);
    fclose(f);
    return rc;
}

// ============================ Delaunay ====================================
// Bowyer-Watson with walking point location. Coordinates are jittered by a
// deterministic epsilon to break exact degeneracies (equivalent in spirit to
// qhull's QJ option used by the scipy fallback).

namespace {

struct Tri {
    int v[3];
    int adj[3];  // adj[i] is the neighbor across the edge opposite v[i]
    bool alive;
};

struct DT {
    std::vector<double> px, py;
    std::vector<Tri> tris;

    double orient(int a, int b, int c) const {
        return (px[b] - px[a]) * (py[c] - py[a]) -
               (py[b] - py[a]) * (px[c] - px[a]);
    }

    bool in_circle(int a, int b, int c, int d) const {
        double adx = px[a] - px[d], ady = py[a] - py[d];
        double bdx = px[b] - px[d], bdy = py[b] - py[d];
        double cdx = px[c] - px[d], cdy = py[c] - py[d];
        double ad = adx * adx + ady * ady;
        double bd = bdx * bdx + bdy * bdy;
        double cd = cdx * cdx + cdy * cdy;
        return (adx * (bdy * cd - bd * cdy) - ady * (bdx * cd - bd * cdx) +
                ad * (bdx * cdy - bdy * cdx)) > 0;
    }
};

}  // namespace

int sfm_delaunay(const float *pts, int n, int *tris_out, int max_tris) {
    if (n < 3) return 0;
    DT dt;
    dt.px.resize(n + 3);
    dt.py.resize(n + 3);
    double minx = 1e300, maxx = -1e300, miny = 1e300, maxy = -1e300;
    for (int i = 0; i < n; i++) {
        // deterministic jitter breaks collinear/duplicate degeneracies
        double jx = 1e-4 * (((i * 2654435761u) & 1023) / 1023.0 - 0.5);
        double jy = 1e-4 * (((i * 40503u + 7) & 1023) / 1023.0 - 0.5);
        dt.px[i] = pts[2 * i] + jx;
        dt.py[i] = pts[2 * i + 1] + jy;
        minx = std::min(minx, dt.px[i]);
        maxx = std::max(maxx, dt.px[i]);
        miny = std::min(miny, dt.py[i]);
        maxy = std::max(maxy, dt.py[i]);
    }
    double cx = (minx + maxx) / 2, cy = (miny + maxy) / 2;
    double r = std::max(maxx - minx, maxy - miny) * 10 + 1;
    int s0 = n, s1 = n + 1, s2 = n + 2;
    dt.px[s0] = cx - 2 * r; dt.py[s0] = cy - r;
    dt.px[s1] = cx + 2 * r; dt.py[s1] = cy - r;
    dt.px[s2] = cx;         dt.py[s2] = cy + 2 * r;
    dt.tris.push_back({{s0, s1, s2}, {-1, -1, -1}, true});

    std::vector<int> bad, stack, cavity_edges;
    int last = 0;

    for (int p = 0; p < n; p++) {
        // walk from `last` toward the triangle containing p
        int t = last;
        for (int steps = 0; steps < (int)dt.tris.size() + 4; steps++) {
            if (!dt.tris[t].alive) { t = (int)dt.tris.size() - 1;
                while (t >= 0 && !dt.tris[t].alive) t--; if (t < 0) return -1;
                continue; }
            const Tri &T = dt.tris[t];
            int next = -1;
            for (int e = 0; e < 3; e++) {
                int a = T.v[(e + 1) % 3], b = T.v[(e + 2) % 3];
                if (dt.orient(a, b, p) < 0) { next = T.adj[e]; break; }
            }
            if (next == -1) break;
            t = next;
            if (t < 0) return -1;  // outside super-triangle: shouldn't happen
        }

        // collect bad triangles (circumcircle contains p) via flood fill
        bad.clear();
        stack.assign(1, t);
        std::vector<char> mark(dt.tris.size(), 0);
        mark[t] = 1;
        while (!stack.empty()) {
            int ti = stack.back();
            stack.pop_back();
            const Tri &T = dt.tris[ti];
            if (!T.alive || !dt.in_circle(T.v[0], T.v[1], T.v[2], p)) continue;
            bad.push_back(ti);
            for (int e = 0; e < 3; e++) {
                int nb = T.adj[e];
                if (nb >= 0 && !mark[nb]) { mark[nb] = 1; stack.push_back(nb); }
            }
        }
        if (bad.empty()) return -1;

        // boundary edges of the cavity: (a, b, outer_neighbor)
        cavity_edges.clear();
        for (int ti : bad) dt.tris[ti].alive = false;
        for (int ti : bad) {
            const Tri &T = dt.tris[ti];
            for (int e = 0; e < 3; e++) {
                int nb = T.adj[e];
                bool nb_bad = nb >= 0 && !dt.tris[nb].alive &&
                              std::find(bad.begin(), bad.end(), nb) != bad.end();
                if (nb < 0 || dt.tris[nb].alive) {
                    cavity_edges.push_back(T.v[(e + 1) % 3]);
                    cavity_edges.push_back(T.v[(e + 2) % 3]);
                    cavity_edges.push_back(nb);
                }
                (void)nb_bad;
            }
        }

        // retriangulate the cavity
        int first_new = (int)dt.tris.size();
        int n_new = (int)cavity_edges.size() / 3;
        for (int k = 0; k < n_new; k++) {
            int a = cavity_edges[3 * k], b = cavity_edges[3 * k + 1];
            int outer = cavity_edges[3 * k + 2];
            Tri nt{{p, a, b}, {outer, -1, -1}, true};
            if (outer >= 0) {
                Tri &O = dt.tris[outer];
                for (int e = 0; e < 3; e++) {
                    int oa = O.v[(e + 1) % 3], ob = O.v[(e + 2) % 3];
                    if ((oa == b && ob == a) || (oa == a && ob == b))
                        O.adj[e] = first_new + k;
                }
            }
            dt.tris.push_back(nt);
        }
        // link new triangles to each other around p: edge opposite v[1]=a is
        // (p, b); edge opposite v[2]=b is (p, a)
        for (int k = 0; k < n_new; k++) {
            Tri &A = dt.tris[first_new + k];
            for (int m = 0; m < n_new; m++) {
                if (m == k) continue;
                Tri &B = dt.tris[first_new + m];
                if (A.v[2] == B.v[1]) A.adj[1] = first_new + m;  // share (p, b)
                if (A.v[1] == B.v[2]) A.adj[2] = first_new + m;  // share (p, a)
            }
        }
        last = first_new;
    }

    int count = 0;
    for (const Tri &T : dt.tris) {
        if (!T.alive) continue;
        if (T.v[0] >= n || T.v[1] >= n || T.v[2] >= n) continue;
        if (count >= max_tris) return count;
        tris_out[3 * count] = T.v[0];
        tris_out[3 * count + 1] = T.v[1];
        tris_out[3 * count + 2] = T.v[2];
        count++;
    }
    return count;
}

// ============================ PLY =========================================

int sfm_write_ply(const char *path, const double *pts, int n) {
    FILE *f = fopen(path, "w");
    if (!f) return -1;
    fprintf(f, "ply\nformat ascii 1.0\nelement vertex %d\n", n);
    fprintf(f, "property float x\nproperty float y\nproperty float z\n");
    fprintf(f, "end_header\n");
    for (int i = 0; i < n; i++)
        fprintf(f, "%g %g %g\n", pts[3 * i], pts[3 * i + 1], pts[3 * i + 2]);
    fclose(f);
    return 0;
}

// Stage-level dump harness for the reference libviso2 CPU pipeline.
//
// Our own harness (not reference code): drives the read-only reference
// sources and dumps per-stage outputs so tests/test_reference_parity.py can
// diff the TPU engine against the reference stage by stage (SURVEY.md §4(b):
// filter responses, match sets, per-frame Tr).
//
// Modes:
//   ref_dump filters <pgm> <outdir>
//       dump sobel3x3/sobel5x5 (u8) and blob5x5/checkerboard5x5 (i16)
//       responses of one image as raw row-major binaries.
//   ref_dump match <dir> <n> <0|1|2> <f> <cu> <cv> <base> <outdir>
//       standalone Matcher (default params, no bucketing, no Tr prior);
//       per frame writes matches_%04d.txt with the 12 p_match fields
//       (matcher.h:85-99) after matchFeatures (pre-bucket).
//   ref_dump vo <dir> <n> <mono|stereo> <f> <cu> <cv> <base> <height> <outdir>
//       full VO; per frame appends to vo.txt:
//       "i ok n_matches n_inliers tr00 .. tr23" (3x4 of Tr_delta).
//
// Build: see build.sh.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "filter.h"
#include "matcher.h"
#include "viso_mono.h"
#include "viso_stereo.h"

static std::vector<uint8_t> load_pgm(const std::string &path, int32_t &w,
                                     int32_t &h) {
    FILE *f = fopen(path.c_str(), "rb");
    if (!f) { fprintf(stderr, "cannot open %s\n", path.c_str()); exit(1); }
    char magic[3] = {0};
    int maxv = 0;
    if (fscanf(f, "%2s %d %d %d", magic, &w, &h, &maxv) != 4 ||
        strcmp(magic, "P5") != 0 || maxv != 255) {
        fprintf(stderr, "bad pgm %s\n", path.c_str()); exit(1);
    }
    fgetc(f);
    std::vector<uint8_t> data(size_t(w) * h);
    if (fread(data.data(), 1, data.size(), f) != data.size()) {
        fprintf(stderr, "short read %s\n", path.c_str()); exit(1);
    }
    fclose(f);
    return data;
}

static void write_raw(const std::string &path, const void *data, size_t bytes) {
    FILE *f = fopen(path.c_str(), "wb");
    if (!f) { fprintf(stderr, "cannot write %s\n", path.c_str()); exit(1); }
    fwrite(data, 1, bytes, f);
    fclose(f);
}

static void dump_matches(const std::string &path,
                         std::vector<Matcher::p_match> &ms) {
    FILE *f = fopen(path.c_str(), "w");
    for (auto &m : ms) {
        fprintf(f, "%.4f %.4f %d %.4f %.4f %d %.4f %.4f %d %.4f %.4f %d\n",
                m.u1p, m.v1p, m.i1p, m.u2p, m.v2p, m.i2p,
                m.u1c, m.v1c, m.i1c, m.u2c, m.v2c, m.i2c);
    }
    fclose(f);
}

int main(int argc, char **argv) {
    if (argc < 2) { fprintf(stderr, "usage: %s <filters|match|vo> ...\n", argv[0]); return 1; }
    std::string mode = argv[1];

    if (mode == "filters") {
        if (argc < 4) { fprintf(stderr, "filters <pgm> <outdir>\n"); return 1; }
        int32_t w = 0, h = 0;
        auto img = load_pgm(argv[2], w, h);
        std::string out = argv[3];
        size_t n = size_t(w) * h;
        std::vector<uint8_t> du(n), dv(n);
        // note arg order: sobel writes (out_v, out_h); the matcher passes
        // (I_du, I_dv) in that order (matcher.cpp:663), so out_v == du.
        filter::sobel5x5(img.data(), du.data(), dv.data(), w, h);
        write_raw(out + "/sobel5_du.u8", du.data(), n);
        write_raw(out + "/sobel5_dv.u8", dv.data(), n);
        filter::sobel3x3(img.data(), du.data(), dv.data(), w, h);
        write_raw(out + "/sobel3_du.u8", du.data(), n);
        write_raw(out + "/sobel3_dv.u8", dv.data(), n);
        std::vector<int16_t> resp(n);
        filter::blob5x5(img.data(), resp.data(), w, h);
        write_raw(out + "/blob5.i16", resp.data(), n * 2);
        filter::checkerboard5x5(img.data(), resp.data(), w, h);
        write_raw(out + "/checker5.i16", resp.data(), n * 2);
        printf("DUMPED filters w=%d h=%d\n", w, h);
        return 0;
    }

    if (mode == "match") {
        if (argc < 10) {
            fprintf(stderr, "match <dir> <n> <0|1|2> <f> <cu> <cv> <base> <outdir>\n");
            return 1;
        }
        std::string dir = argv[2];
        int n = atoi(argv[3]);
        int method = atoi(argv[4]);
        double f = atof(argv[5]), cu = atof(argv[6]), cv = atof(argv[7]);
        double base = atof(argv[8]);
        std::string out = argv[9];

        Matcher::parameters mp;  // defaults (matcher.h:52-68)
        Matcher matcher(mp);
        matcher.setIntrinsics(f, cu, cv, base);

        int32_t w = 0, h = 0;
        char buf[512];
        for (int i = 0; i < n; i++) {
            if (method == 0) {
                snprintf(buf, sizeof buf, "%s/%06d.pgm", dir.c_str(), i);
                auto img = load_pgm(buf, w, h);
                uint32_t dims[3] = {uint32_t(w), uint32_t(h), uint32_t(w)};
                matcher.pushBack(img.data(), dims, false);
                if (i == 0) continue;
            } else {
                snprintf(buf, sizeof buf, "%s/%06d_l.pgm", dir.c_str(), i);
                auto img_l = load_pgm(buf, w, h);
                snprintf(buf, sizeof buf, "%s/%06d_r.pgm", dir.c_str(), i);
                auto img_r = load_pgm(buf, w, h);
                uint32_t dims[3] = {uint32_t(w), uint32_t(h), uint32_t(w)};
                matcher.pushBack(img_l.data(), img_r.data(), dims, false);
                if (method == 2 && i == 0) continue;
            }
            matcher.matchFeatures(method);
            auto ms = matcher.getMatches();
            snprintf(buf, sizeof buf, "%s/matches_%04d.txt", out.c_str(), i);
            dump_matches(buf, ms);
        }
        printf("DUMPED match method=%d frames=%d\n", method, n);
        return 0;
    }

    if (mode == "vo") {
        if (argc < 11) {
            fprintf(stderr, "vo <dir> <n> <mono|stereo> <f> <cu> <cv> <base> <height> <outdir>\n");
            return 1;
        }
        std::string dir = argv[2];
        int n = atoi(argv[3]);
        std::string kind = argv[4];
        double f = atof(argv[5]), cu = atof(argv[6]), cv = atof(argv[7]);
        double base = atof(argv[8]), height = atof(argv[9]);
        std::string out = argv[10];
        int refinement = argc > 11 ? atoi(argv[11]) : 1;  // matcher.h default
        FILE *fo = fopen((out + "/vo.txt").c_str(), "w");

        int32_t w = 0, h = 0;
        char buf[512];
        if (kind == "mono") {
            VisualOdometryMono::parameters param;
            param.calib.f = f; param.calib.cu = cu; param.calib.cv = cv;
            param.height = height; param.pitch = 0.0;
            param.bucket.max_features = 1000;  // like main.cpp:71
            param.match.refinement = refinement;
            VisualOdometryMono viso(param);
            for (int i = 0; i < n; i++) {
                snprintf(buf, sizeof buf, "%s/%06d.pgm", dir.c_str(), i);
                auto img = load_pgm(buf, w, h);
                uint32_t dims[3] = {uint32_t(w), uint32_t(h), uint32_t(w)};
                bool ok = viso.process(img.data(), dims, false);
                Matrix tr = viso.getMotion();
                fprintf(fo, "%d %d %d %d", i, ok ? 1 : 0,
                        (int)viso.getNumberOfMatches(),
                        (int)viso.getNumberOfInliers());
                for (int r = 0; r < 3; r++)
                    for (int c = 0; c < 4; c++)
                        fprintf(fo, " %.9g", tr.val[r][c]);
                fprintf(fo, "\n");
            }
        } else {
            VisualOdometryStereo::parameters param;
            param.calib.f = f; param.calib.cu = cu; param.calib.cv = cv;
            param.base = base;
            param.bucket.max_features = 1000;
            param.match.refinement = refinement;
            VisualOdometryStereo viso(param);
            for (int i = 0; i < n; i++) {
                snprintf(buf, sizeof buf, "%s/%06d_l.pgm", dir.c_str(), i);
                auto img_l = load_pgm(buf, w, h);
                snprintf(buf, sizeof buf, "%s/%06d_r.pgm", dir.c_str(), i);
                auto img_r = load_pgm(buf, w, h);
                uint32_t dims[3] = {uint32_t(w), uint32_t(h), uint32_t(w)};
                bool ok = viso.process(img_l.data(), img_r.data(), dims, false);
                Matrix tr = viso.getMotion();
                fprintf(fo, "%d %d %d %d", i, ok ? 1 : 0,
                        (int)viso.getNumberOfMatches(),
                        (int)viso.getNumberOfInliers());
                for (int r = 0; r < 3; r++)
                    for (int c = 0; c < 4; c++)
                        fprintf(fo, " %.9g", tr.val[r][c]);
                fprintf(fo, "\n");
            }
        }
        fclose(fo);
        printf("DUMPED vo kind=%s frames=%d\n", kind.c_str(), n);
        return 0;
    }

    fprintf(stderr, "unknown mode %s\n", mode.c_str());
    return 1;
}

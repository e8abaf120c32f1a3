// Benchmark driver for the reference libviso2 CPU pipeline.
//
// Our own harness (not the reference's main.cpp): reads raw 8-bit PGM frames
// produced by sfm_tpu.utils.synthetic, runs the reference mono or stereo VO
// end to end, and reports frames/sec + per-frame poses so the TPU engine has
// a CPU denominator (BASELINE.md "first measurement task").
//
// Build: see build.sh (links against the read-only reference sources,
// no OpenCL/SFML/png++ needed for the plain CPU path).

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <string>
#include <vector>

#include "viso_mono.h"
#include "viso_stereo.h"
#include "reconstruction.h"

static std::vector<uint8_t> load_pgm(const std::string &path, int32_t &w, int32_t &h) {
    FILE *f = fopen(path.c_str(), "rb");
    if (!f) { fprintf(stderr, "cannot open %s\n", path.c_str()); exit(1); }
    char magic[3] = {0};
    int maxv = 0;
    if (fscanf(f, "%2s %d %d %d", magic, &w, &h, &maxv) != 4 ||
        strcmp(magic, "P5") != 0 || maxv != 255) {
        fprintf(stderr, "bad pgm %s\n", path.c_str()); exit(1);
    }
    fgetc(f);  // single whitespace after header
    std::vector<uint8_t> data(size_t(w) * h);
    if (fread(data.data(), 1, data.size(), f) != data.size()) {
        fprintf(stderr, "short read %s\n", path.c_str()); exit(1);
    }
    fclose(f);
    return data;
}

int main(int argc, char **argv) {
    if (argc < 7) {
        fprintf(stderr,
                "usage: %s <dir> <n_frames> <mono|stereo> <f> <cu> <cv> "
                "[base] [height]\n", argv[0]);
        return 1;
    }
    std::string dir = argv[1];
    int n = atoi(argv[2]);
    std::string mode = argv[3];
    double f = atof(argv[4]), cu = atof(argv[5]), cv = atof(argv[6]);
    double base = argc > 7 ? atof(argv[7]) : 0.5;
    double height = argc > 8 ? atof(argv[8]) : 1.6;

    int32_t w = 0, h = 0;
    char namebuf[256];

    if (mode == "mono") {
        VisualOdometryMono::parameters param;
        param.calib.f = f; param.calib.cu = cu; param.calib.cv = cv;
        param.height = height; param.pitch = 0.0;
        param.bucket.max_features = 1000;  // like main.cpp:71
        VisualOdometryMono viso(param);
        int ok_count = 0;
        auto t0 = std::chrono::high_resolution_clock::now();
        for (int i = 0; i < n; i++) {
            snprintf(namebuf, sizeof namebuf, "%s/%06d.pgm", dir.c_str(), i);
            auto img = load_pgm(namebuf, w, h);
            uint32_t dims[3] = {uint32_t(w), uint32_t(h), uint32_t(w)};
            bool ok = viso.process(img.data(), dims, false);
            if (i > 0 && ok) {
                ok_count++;
                Matrix tr = viso.getMotion();
                printf("POSE %d %g %g %g\n", i, tr.val[0][3], tr.val[1][3],
                       tr.val[2][3]);
            }
        }
        auto t1 = std::chrono::high_resolution_clock::now();
        double secs = std::chrono::duration<double>(t1 - t0).count();
        printf("RESULT mode=mono frames=%d ok=%d secs=%.3f fps=%.3f\n",
               n, ok_count, secs, n / secs);
    } else {
        VisualOdometryStereo::parameters param;
        param.calib.f = f; param.calib.cu = cu; param.calib.cv = cv;
        param.base = base;
        param.bucket.max_features = 1000;
        VisualOdometryStereo viso(param);
        int ok_count = 0;
        auto t0 = std::chrono::high_resolution_clock::now();
        for (int i = 0; i < n; i++) {
            snprintf(namebuf, sizeof namebuf, "%s/%06d_l.pgm", dir.c_str(), i);
            auto img_l = load_pgm(namebuf, w, h);
            snprintf(namebuf, sizeof namebuf, "%s/%06d_r.pgm", dir.c_str(), i);
            auto img_r = load_pgm(namebuf, w, h);
            uint32_t dims[3] = {uint32_t(w), uint32_t(h), uint32_t(w)};
            bool ok = viso.process(img_l.data(), img_r.data(), dims, false);
            if (i > 0 && ok) {
                ok_count++;
                Matrix tr = viso.getMotion();
                printf("POSE %d %g %g %g\n", i, tr.val[0][3], tr.val[1][3],
                       tr.val[2][3]);
            }
        }
        auto t1 = std::chrono::high_resolution_clock::now();
        double secs = std::chrono::duration<double>(t1 - t0).count();
        printf("RESULT mode=stereo frames=%d ok=%d secs=%.3f fps=%.3f\n",
               n, ok_count, secs, n / secs);
    }
    return 0;
}

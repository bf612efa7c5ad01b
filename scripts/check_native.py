"""Memory-safety check for the native data-loader (ASan/UBSan + canaries).

Builds ``native/dataloader.cpp`` into a standalone harness instrumented
with AddressSanitizer + UndefinedBehaviorSanitizer, generates an edge-case
image zoo (truncated/garbage files, 16-bit/palette/interlaced PNGs,
CMYK/progressive JPEGs, extreme aspect ratios, tiny images), and exercises
every C ABI entry point — single- and multi-threaded — with canary-guarded
output buffers and full output-range assertions.

This is the native counterpart of ``tpu_selftest.py``'s kernel-numerics
discipline: the reference trusts upstream-tested torchvision/libjpeg C++
(reference dataset.py:126-139); our own native code earns the same trust by
being sanitizer-clean over this corpus.  Run it after any dataloader.cpp
change:

    python scripts/check_native.py

Exit 0 = clean.  Not part of the pytest suite (builds a second binary and
runs ~1 min on the 1-core CI box).
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HARNESS = r"""
// ASan/UBSan harness for native/dataloader.cpp: exercises every entry point
// over an edge-case image zoo, at several target sizes, single- and
// multi-threaded, with canary-guarded output buffers.
#include <cstdio>
#include <cstdlib>
#include <cstdint>
#include <dirent.h>
#include <string>
#include <vector>

extern "C" {
int dft_version();
void dft_free(void* p);
uint8_t* dft_decode_rgb(const char* path, int* w, int* h);
int dft_load_one(const char* path, int size, int flip, float* out);
int dft_load_batch(const char** paths, int n, int size, const int* flips,
                   float* out, int n_threads);
}

int main(int argc, char** argv) {
  const char* dir = argc > 1 ? argv[1] : "/tmp/dft_imgzoo";
  std::vector<std::string> paths;
  DIR* d = opendir(dir);
  if (!d) { printf("no zoo dir %s\n", dir); return 2; }
  dirent* e;
  while ((e = readdir(d))) {
    if (e->d_name[0] == '.') continue;
    paths.push_back(std::string(dir) + "/" + e->d_name);
  }
  closedir(d);
  int sizes[] = {512, 64, 8, 3, 1};

  for (auto& p : paths) {
    int w = -1, h = -1;
    uint8_t* rgb = dft_decode_rgb(p.c_str(), &w, &h);
    if (rgb) {
      size_t total = 0;  // touch every byte: ASan catches under-allocation
      for (size_t i = 0; i < size_t(w) * h * 3; ++i) total += rgb[i];
      dft_free(rgb);
    }
    for (int s : sizes) {
      size_t n = size_t(s) * s * 3;
      std::vector<float> out(n + 64, -777.0f);  // canary tail
      int rc = dft_load_one(p.c_str(), s, s % 2, out.data());
      for (size_t i = n; i < n + 64; ++i)
        if (out[i] != -777.0f) { printf("CANARY SMASH %s s=%d\n", p.c_str(), s); return 1; }
      if (rc == 0)
        for (size_t i = 0; i < n; ++i)
          if (!(out[i] >= -1.001f && out[i] <= 1.001f)) {
            printf("RANGE VIOLATION %s s=%d i=%zu v=%f\n", p.c_str(), s, i, out[i]);
            return 1;
          }
    }
  }

  std::vector<const char*> cpaths;
  for (auto& p : paths) cpaths.push_back(p.c_str());
  std::vector<int> flips(cpaths.size());
  for (size_t i = 0; i < flips.size(); ++i) flips[i] = i % 2;
  for (int s : {512, 8}) {
    for (int nt : {1, 4, 16}) {
      size_t n = cpaths.size() * size_t(s) * s * 3;
      std::vector<float> out(n + 64, -777.0f);
      dft_load_batch(cpaths.data(), int(cpaths.size()), s, flips.data(),
                     out.data(), nt);
      for (size_t i = n; i < n + 64; ++i)
        if (out[i] != -777.0f) { printf("BATCH CANARY SMASH\n"); return 1; }
    }
  }
  printf("ALL OK (version %d)\n", dft_version());
  return 0;
}
"""


def make_zoo(d: str) -> None:
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)

    def arr(w, h, ch=3):
        return rng.integers(0, 256, (h, w, ch), dtype=np.uint8)

    Image.fromarray(arr(640, 480)).save(f"{d}/rgb.jpg", quality=90)
    Image.fromarray(arr(640, 480)).save(f"{d}/rgb.png")
    Image.fromarray(arr(1, 1)).save(f"{d}/t1x1.png")
    Image.fromarray(arr(2, 3)).save(f"{d}/t2x3.jpg")
    Image.fromarray(arr(3, 2)).save(f"{d}/t3x2.png")
    Image.fromarray(arr(2048, 4)).save(f"{d}/wide.jpg")
    Image.fromarray(arr(4, 2048)).save(f"{d}/tall.png")
    Image.fromarray(arr(100, 80, 1)[:, :, 0]).save(f"{d}/gray.png")
    Image.fromarray(arr(100, 80, 1)[:, :, 0]).save(f"{d}/gray.jpg")
    Image.fromarray(arr(100, 80, 4)).save(f"{d}/rgba.png")
    Image.fromarray(arr(64, 64)).convert("P").save(f"{d}/palette.png")
    im16 = rng.integers(0, 65536, (80, 100), dtype=np.uint16)
    Image.fromarray(im16).save(f"{d}/gray16.png")
    Image.fromarray(arr(64, 64)).convert("1").save(f"{d}/bilevel.png")
    Image.fromarray(arr(64, 64)).convert("LA").save(f"{d}/grayalpha.png")
    Image.fromarray(arr(200, 150)).save(f"{d}/interlaced.png", interlace=True)
    Image.fromarray(arr(200, 150)).save(f"{d}/progressive.jpg", progressive=True)
    Image.fromarray(arr(64, 64)).convert("CMYK").save(f"{d}/cmyk.jpg")
    p = Image.fromarray(arr(64, 64)).convert("P")
    p.save(f"{d}/palette_trns.png", transparency=0)
    with open(f"{d}/rgb.jpg", "rb") as f:
        b = f.read()
    with open(f"{d}/trunc.jpg", "wb") as f:
        f.write(b[: len(b) // 3])
    with open(f"{d}/rgb.png", "rb") as f:
        b = f.read()
    with open(f"{d}/trunc.png", "wb") as f:
        f.write(b[: len(b) // 3])
    with open(f"{d}/garbage.jpg", "wb") as f:
        f.write(b"\xff\xd8" + os.urandom(500))
    with open(f"{d}/garbage.png", "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n" + os.urandom(500))
    with open(f"{d}/empty.png", "wb") as f:
        f.write(b"")


def main() -> int:
    with tempfile.TemporaryDirectory(prefix="dft_native_check_") as tmp:
        zoo = os.path.join(tmp, "zoo")
        os.makedirs(zoo)
        make_zoo(zoo)
        src = os.path.join(tmp, "harness.cpp")
        with open(src, "w") as f:
            f.write(HARNESS)
        exe = os.path.join(tmp, "harness")
        build = subprocess.run(
            ["g++", "-O1", "-g", "-std=c++17",
             "-fsanitize=address,undefined", "-fno-omit-frame-pointer",
             "-o", exe, src, os.path.join(REPO, "native", "dataloader.cpp"),
             "-ljpeg", "-lpng", "-lpthread"],
            capture_output=True, text=True,
        )
        if build.returncode != 0:
            print(build.stderr)
            return 2
        run = subprocess.run(
            [exe, zoo], capture_output=True, text=True,
            env=dict(os.environ, ASAN_OPTIONS="detect_leaks=1",
                     UBSAN_OPTIONS="print_stacktrace=1:halt_on_error=1"),
            timeout=600,
        )
        # libjpeg/libpng print expected per-file decode errors on stderr;
        # sanitizer findings contain "ERROR:" / "runtime error:"
        bad = ("ERROR: AddressSanitizer" in run.stderr
               or "runtime error:" in run.stderr
               or "LeakSanitizer" in run.stderr)
        sys.stdout.write(run.stdout)
        if bad:
            sys.stderr.write(run.stderr)
        ok = run.returncode == 0 and not bad and "ALL OK" in run.stdout
        print("PASS" if ok else "FAIL")
        return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

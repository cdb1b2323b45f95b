#!/bin/sh
# Build the reference C++ ICET as a command-line oracle (golden-value and
# timing source). Compiles the UNMODIFIED reference sources from
# /root/reference against the Eigen headers bundled inside this image's
# tensorflow wheel (no system Eigen exists). Serial PSTL backend: no TBB in
# the image, so the reference's std::execution::par sorts run serially —
# its timings here are a LOWER bound on spread vs its published 35 ms
# (measured on this 4-core host: best 43 ms runlen-7, 54 ms runlen-12 on
# frame_804/805).
set -e
HERE=$(dirname "$(readlink -f "$0")")
OUT=${1:-/tmp/refbuild}
TFINC=/opt/venv/lib/python3.12/site-packages/tensorflow/include
mkdir -p "$OUT"
for tool in oracle oracle_timed; do
  g++ -O2 -std=c++17 -I"$TFINC" -I/root/reference/include \
      -D_GLIBCXX_USE_TBB_PAR_BACKEND=0 \
      "$HERE/$tool.cpp" \
      /root/reference/src/icet.cpp /root/reference/src/utils.cpp \
      /root/reference/src/ThreadPool.cpp \
      -o "$OUT/$tool" -pthread
done
echo "built: $OUT/oracle $OUT/oracle_timed"
echo "usage: oracle s1.bin s2.bin runlen nphi ntheta n thresh buff [x0 x 6]"
echo "       (raw float32 xyz binaries; pre-filter range > minD yourself)"

#!/bin/bash
# Build the reference ORB-SLAM2 binaries for BASELINE.md measurement.
#
# Copies /root/reference to a scratch tree (the mount is read-only and must
# never be modified), patches out components whose dev dependencies do not
# exist in this container (Pangolin/GL, Boost; Eigen comes from the
# TensorFlow wheel), and runs the reference's own two-stage superbuild.
# The SLAM algorithm code is untouched; see patch_tree.py.
#
# Usage: build_reference.sh [workdir]   (default /tmp/refbuild)
set -euo pipefail

WORK=${1:-/tmp/refbuild}
HERE=$(cd "$(dirname "$0")" && pwd)
SHIMS=$HERE/shims
STUBS=$HERE/stubs
JOBS=${JOBS:-2}

mkdir -p "$WORK"
if [ ! -d "$WORK/src/Source" ]; then
  echo "== copying reference tree =="
  mkdir -p "$WORK/src"
  cp -r /root/reference/Source "$WORK/src/Source"
  cp -r /root/reference/Scripts "$WORK/src/Scripts"
  cp /root/reference/Build.sh "$WORK/src/" 2>/dev/null || true
  rm -rf "$WORK/src/Source/Examples/ROS"   # no ROS in container
  python "$HERE/patch_tree.py" "$WORK/src" "$SHIMS" "$STUBS"
fi

cd "$WORK/src"

echo "== ThirdParty superbuild (g2o, DLib, DBoW2) =="
mkdir -p Build/Release/Source/ThirdParty
cd Build/Release/Source/ThirdParty
cmake ../../../../Source/ThirdParty -DCMAKE_BUILD_TYPE=Release >/dev/null
make -j"$JOBS"
cd "$WORK/src"

echo "== Source build =="
# A vocabulary file must exist for the Vocabulary install rule; the real
# ORBvoc.txt.zip blob is absent from the reference snapshot, so the caller
# must have placed a trained vocabulary at Source/Vocabulary/ORBvoc.txt
# (scripts/train_ref_vocab.py writes DBoW2 text format).
if [ ! -f Source/Vocabulary/ORBvoc.txt ]; then
  echo "WARNING: Source/Vocabulary/ORBvoc.txt missing; install will fail." >&2
fi
mkdir -p Build/Release/Source
cd Build/Release/Source
cmake ../../../Source -DCMAKE_BUILD_TYPE=Release >/dev/null
make -j"$JOBS"
make install >/dev/null

echo "== done =="
ls "$WORK/src/Install/bin"

#!/bin/bash
# Unzip a downloaded 7Scenes scene into the deepslam_data layout.
# Usage: ./setup_7scenes.sh <scene> [data_root]
set -e
SCENE=${1:?usage: setup_7scenes.sh <scene> [data_root]}
ROOT=${2:-data/deepslam_data/7Scenes}
cd "$ROOT/$SCENE"
for f in *.zip; do unzip -n "$f"; done
for f in seq-*.zip; do unzip -n "$f"; done 2>/dev/null || true
echo "$SCENE extracted under $ROOT"

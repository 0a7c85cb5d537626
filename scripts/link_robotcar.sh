#!/bin/bash
# Symlink a downloaded Oxford RobotCar tree into the deepslam_data layout.
# Usage: ./link_robotcar.sh <downloaded_robotcar_root>
set -e
SRC=${1:?usage: link_robotcar.sh <downloaded_robotcar_root>}
DST=data/deepslam_data/RobotCar
mkdir -p "$DST"
for scene in "$SRC"/*/; do
  ln -sfn "$(realpath "$scene")" "$DST/$(basename "$scene")"
done
echo "linked $(ls "$DST" | wc -l) scenes into $DST"

#!/bin/bash
# Write pose_stats.txt for every 7Scenes scene.
set -e
for scene in chess fire heads office pumpkin redkitchen stairs; do
  python -m geomapnet_tpu.cli.tools calc_pose_stats \
    --dataset 7Scenes --scene "$scene" --data_path data/deepslam_data/7Scenes
done

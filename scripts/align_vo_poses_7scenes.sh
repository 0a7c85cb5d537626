#!/bin/bash
# Compute the per-sequence DSO-VO -> GT alignment for every sequence of a
# 7Scenes scene. Usage: ./align_vo_poses_7scenes.sh <scene> [n_seqs]
set -e
SCENE=${1:?usage: align_vo_poses_7scenes.sh <scene> [n_seqs]}
N=${2:-6}
for seq in $(seq 1 "$N"); do
  python -m geomapnet_tpu.cli.tools align_vo_poses \
    --dataset 7Scenes --scene "$SCENE" --seq "$seq" --vo_lib dso \
    --data_path data/deepslam_data/7Scenes || true
done

#!/bin/bash
# Download TUM RGB-D sequences used by the configs.
set -e
mkdir -p Datasets/TUM_RGBD
cd Datasets/TUM_RGBD
for seq in freiburg1_desk freiburg2_xyz freiburg3_long_office_household; do
  wget "https://cvg.cit.tum.de/rgbd/dataset/${seq%%_*}/rgbd_dataset_${seq}.tgz"
  tar -xzf "rgbd_dataset_${seq}.tgz"
  rm -f "rgbd_dataset_${seq}.tgz"
done

#!/bin/bash
# Download precomputed ScanNet scene0000 run outputs (ckpts + meshes) for the
# interactive visualizer (visualizer.py / tools/viz.py). Counterpart of the
# reference's scripts/download_vis_scene0000.sh.
set -e
mkdir -p output/vis/scannet/scans
cd output/vis/scannet/scans
wget https://cvg-data.inf.ethz.ch/nice-slam/vis/scannet/scans/scene0000_00.zip
unzip scene0000_00.zip
rm -f scene0000_00.zip
echo "scene0000_00 visualization outputs ready under output/vis/scannet/scans"

#!/bin/bash
# Download precomputed Replica room1 run outputs (ckpts + meshes) for the
# interactive visualizer (visualizer.py / tools/viz.py). Counterpart of the
# reference's scripts/download_vis_room1.sh.
set -e
mkdir -p output/vis/Replica
cd output/vis/Replica
wget https://cvg-data.inf.ethz.ch/nice-slam/vis/Replica/room1.zip
unzip room1.zip
rm -f room1.zip
echo "room1 visualization outputs ready under output/vis/Replica/room1"

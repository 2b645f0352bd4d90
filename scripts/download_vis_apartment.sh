#!/bin/bash
# Download precomputed Apartment run outputs (ckpts + meshes) for the
# interactive visualizer (visualizer.py / tools/viz.py). Counterpart of the
# reference's scripts/download_vis_apartment.sh.
set -e
mkdir -p output/vis
cd output/vis
wget https://cvg-data.inf.ethz.ch/nice-slam/vis/Apartment.zip
unzip Apartment.zip
rm -f Apartment.zip
echo "Apartment visualization outputs ready under output/vis/Apartment"

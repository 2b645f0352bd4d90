#!/bin/bash
# Download the short ScanNet demo snippet (the reference's de-facto smoke
# test, driven by configs/Demo/demo.yaml) into Datasets/Demo. Counterpart of
# the reference's scripts/download_demo.sh.
set -e
mkdir -p Datasets
cd Datasets
wget https://cvg-data.inf.ethz.ch/nice-slam/data/Demo.zip
unzip Demo.zip
rm -f Demo.zip
echo "Demo sequence ready under Datasets/Demo"

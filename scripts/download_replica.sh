#!/bin/bash
# Download the Replica SLAM sequences (as prepared by iMAP/NICE-SLAM) into
# Datasets/Replica. Counterpart of the reference's scripts/download_replica.sh.
set -e
mkdir -p Datasets
cd Datasets
wget https://cvg-data.inf.ethz.ch/nice-slam/data/Replica.zip
unzip Replica.zip
rm -f Replica.zip
echo "Replica sequences ready under Datasets/Replica"

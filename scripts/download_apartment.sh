#!/bin/bash
# Download the NICE-SLAM Apartment capture (Azure Kinect).
set -e
mkdir -p Datasets
cd Datasets
wget https://cvg-data.inf.ethz.ch/nice-slam/data/Apartment.zip
unzip Apartment.zip
rm -f Apartment.zip

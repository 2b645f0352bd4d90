#!/bin/bash
# Download the CoFusion room4 sequence.
set -e
mkdir -p Datasets/CoFusion
cd Datasets/CoFusion
wget http://visual.cs.ucl.ac.uk/pubs/cofusion/data/room4-full.tar.gz
tar -xzf room4-full.tar.gz
rm -f room4-full.tar.gz

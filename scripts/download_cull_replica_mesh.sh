#!/bin/bash
# Download the culled Replica ground-truth meshes used by tools/eval_recon.py
# as the GT side of the 3D metrics. Counterpart of the reference's
# scripts/download_cull_replica_mesh.sh.
set -e
wget https://cvg-data.inf.ethz.ch/nice-slam/cull_replica_mesh.zip
unzip cull_replica_mesh.zip
rm -f cull_replica_mesh.zip
echo "culled Replica GT meshes ready under cull_replica_mesh/"

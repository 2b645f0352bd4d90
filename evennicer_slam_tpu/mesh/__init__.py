from evennicer_slam_tpu.mesh.mesher import Mesher
from evennicer_slam_tpu.mesh.trimesh_lite import Mesh
from evennicer_slam_tpu.mesh.marching import marching_cubes

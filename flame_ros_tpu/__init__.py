"""flame_ros_tpu — TPU-native dense monocular depth estimation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of FLaME
(Fast Lightweight Mesh Estimation, Greene & Roy ICCV'17) and its flame_ros
frontends: batched epipolar inverse-depth filtering, Delaunay-graph
NLTGV2-L1 variational smoothing, dense mesh/depthmap products, dataset
frontends (TUM RGB-D, EuRoC/ASL), ground-truth evaluation, streaming
drivers, and multi-chip sharding over jax device meshes.
"""
from flame_ros_tpu.config import FlameParams
from flame_ros_tpu.geometry.se3 import SE3
from flame_ros_tpu.geometry.camera import Pinhole

__version__ = "0.1.0"
__all__ = ["FlameParams", "SE3", "Pinhole", "__version__"]

"""TPU-native DSVT 3D object detection framework.

A ground-up JAX/XLA/Pallas re-build of the DSVT-AI-TRT inference engine
(jingyue202205/DSVT-AI-TRT): dynamic pillar voxelization, the DSVT rotated-set
transformer backbone, BEV ResNet + CenterHead, and on-device postprocessing
including rotated NMS — one XLA program from points to boxes.
"""

from .config import DSVTConfig, DEFAULT_CONFIG, WindowSpec

__version__ = "0.1.0"
__all__ = ["DSVTConfig", "DEFAULT_CONFIG", "WindowSpec"]

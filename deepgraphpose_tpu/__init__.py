"""deepgraphpose_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of DeepGraphPose.

A semi-supervised deep graphical model for animal pose tracking from video,
re-designed from scratch for TPU hardware: Flax ResNet backbones with deconv
scoremap / location-refinement heads, a fully jittable masked DGP objective
(network + spatial + temporal cliques over soft-argmax keypoints), streaming
batched video inference, and data-parallel training over a `jax.sharding.Mesh`.

Capability surface mirrors paninski-lab/deepgraphpose (see SURVEY.md):
the DLC project filestructure (config.yaml, labeled-data/, dlc-models/,
training-datasets/, videos_dgp/) is read and written natively.
"""

__version__ = "0.1.0"

from deepgraphpose_tpu.core.config import PoseConfig, ProjectConfig  # noqa: F401

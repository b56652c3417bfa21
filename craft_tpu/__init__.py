"""CRAFT-TPU: a TPU-native JAX optical-flow framework.

Re-implements the full capability surface of askerlee/craft (CVPR 2022) —
RAFT / CRAFT_nogma / CRAFT models, training curriculum, evaluation and
submission tooling — designed TPU-first: XLA convs, Pallas correlation and
attention kernels, lax.scan refinement, pjit data-parallel training.
"""

__version__ = "0.1.0"

from craft_tpu.config import (ModelConfig, SETransSiteConfig, craft_config,
                              craft_nogma_config, raft_config)
from craft_tpu.models.flow_model import FlowModel, create_model

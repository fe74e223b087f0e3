from .visualcloze import VisualClozeModel
from .loader import build_visualcloze, random_components, synthetic_full_components
from .orchestrator import PipelinedServer, ReplicaPool
from .diffusers_api import VisualClozePipeline, VisualClozePipelineOutput
from . import preprocessing

__all__ = [
    "VisualClozeModel",
    "VisualClozePipeline",
    "VisualClozePipelineOutput",
    "build_visualcloze",
    "random_components",
    "synthetic_full_components",
    "PipelinedServer",
    "ReplicaPool",
    "preprocessing",
]

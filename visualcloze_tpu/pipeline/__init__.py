from .visualcloze import VisualClozeModel
from .loader import build_visualcloze, random_components
from .orchestrator import PipelinedServer, ReplicaPool
from . import preprocessing

__all__ = [
    "VisualClozeModel",
    "build_visualcloze",
    "random_components",
    "PipelinedServer",
    "ReplicaPool",
    "preprocessing",
]

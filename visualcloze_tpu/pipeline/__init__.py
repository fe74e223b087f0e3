from .visualcloze import VisualClozeModel
from .loader import build_visualcloze, random_components
from .orchestrator import PipelinedServer
from . import preprocessing

__all__ = [
    "VisualClozeModel",
    "build_visualcloze",
    "random_components",
    "PipelinedServer",
    "preprocessing",
]

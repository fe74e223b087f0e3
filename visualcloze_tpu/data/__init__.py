from .dataset import GridDataset
from .data_reader import Graph200KItemProcessor
from .data_utils import check_item_graph200k, dataloader_collate_fn, get_train_sampler
from .degradations import add_degradation, available_degradations
from .loader import DataLoader
from . import prefix_instruction

__all__ = [
    "GridDataset", "Graph200KItemProcessor",
    "check_item_graph200k", "dataloader_collate_fn", "get_train_sampler",
    "add_degradation", "available_degradations", "DataLoader",
    "prefix_instruction",
]

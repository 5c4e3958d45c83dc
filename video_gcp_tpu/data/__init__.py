from video_gcp_tpu.data.datasets import (
    FolderSplitVarLenVideoDataset,
    GlobalSplitVarLenVideoDataset,
    MazeGlobalSplitVarLenVideoDataset,
    MazeTopRenderedGlobalSplitVarLenVideoDataset,
    RandomVideoDataset,
    VarLenVideoDataset,
)
from video_gcp_tpu.data.loader import DataLoader

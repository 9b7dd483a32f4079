from anemoi_tpu.data.dataset import NpyDataset, SyntheticDataset, open_dataset
from anemoi_tpu.data.datamodule import DataModule, WindowSampler

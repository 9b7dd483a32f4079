from anemoi_tpu.data_indices.collection import IndexCollection
from anemoi_tpu.data_indices.tensor import TensorIndex

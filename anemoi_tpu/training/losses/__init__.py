from anemoi_tpu.training.losses.base import BaseLoss, ScaleTensor, loss_registry, get_loss_function
from anemoi_tpu.training.losses import leaves  # noqa: F401  (registers leaf losses)
from anemoi_tpu.training.losses import spectral  # noqa: F401  (registers spectral losses)
from anemoi_tpu.training.losses import wrappers  # noqa: F401  (registers wrapper losses)

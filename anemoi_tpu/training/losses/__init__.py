from anemoi_tpu.training.losses.base import BaseLoss, ScaleTensor, loss_registry, get_loss_function
from anemoi_tpu.training.losses import leaves  # noqa: F401  (registers leaf losses)

from anemoi_tpu.utils.config import DotDict, load_config
from anemoi_tpu.utils.registry import Registry

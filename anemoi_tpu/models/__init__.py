from anemoi_tpu.utils.registry import Registry

model_registry = Registry("model")

# populate the registry
from anemoi_tpu.models import encoder_processor_decoder  # noqa: E402,F401
from anemoi_tpu.models import transport_model  # noqa: E402,F401
from anemoi_tpu.models import hierarchical  # noqa: E402,F401

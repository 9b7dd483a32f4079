from anemoi_tpu.models.transport.objectives import (
    EDMConfig,
    edm_preconditioning,
    edm_training_targets,
    interpolant_training_targets,
)
from anemoi_tpu.models.transport.schedules import (
    karras_sigma_schedule,
    linear_sigma_schedule,
    unit_time_schedule,
)

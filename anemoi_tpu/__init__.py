"""anemoi-tpu: a TPU-native (JAX/XLA/Pallas) weather-modelling framework.

A from-scratch rebuild of the capabilities of ecmwf/anemoi-core
(anemoi-graphs + anemoi-models + anemoi-training) designed TPU-first:

- graphs:        heterogeneous grid<->mesh graph construction (numpy/scipy host-side)
- models:        encoder-processor-decoder graph networks in flax.linen with
                 pure-JAX segment-op and Pallas sparse-attention backends
- training:      jitted rollout training loop (optax/orbax) with area-weighted,
                 CRPS and spectral losses
- parallel:      jax.sharding.Mesh (data, model, ensemble) parallelism with
                 shard_map collectives over ICI
"""

__version__ = "0.1.0"

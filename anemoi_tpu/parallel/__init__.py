from anemoi_tpu.parallel.mesh import MeshSpec, create_mesh, batch_sharding, replicate

from .sharding import (molecule_mesh, shard_molecules,  # noqa: F401
                       sharded_energy_fn, sharded_force_fn,
                       sharded_xlbomd_step, xlbomd_state_specs,
                       make_train_step)

from .sharding import (molecule_mesh, pad_to_mesh,  # noqa: F401
                       shard_molecules,
                       sharded_energy_fn, sharded_force_fn,
                       sharded_xlbomd_step, xlbomd_state_specs,
                       make_train_step)

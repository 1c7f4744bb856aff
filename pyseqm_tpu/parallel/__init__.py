from .sharding import (molecule_mesh, shard_molecules,  # noqa: F401
                       sharded_energy_fn, sharded_force_fn,
                       make_train_step)

"""Multi-chip parallelism: device meshes, sharding specs, sharded train steps."""

"""Multi-chip sharding layer (mesh + shard_map query/build)."""

__all__: list[str] = []

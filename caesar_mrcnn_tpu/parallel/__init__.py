"""Device-mesh parallelism: data-parallel sharding + multihost helpers."""

"""Multi-device: mesh sharding, distributed top-k."""

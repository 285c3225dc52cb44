"""Device-mesh sharding utilities."""

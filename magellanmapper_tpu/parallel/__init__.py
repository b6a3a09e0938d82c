"""Device-mesh parallelism: sharded volumes, halo exchange, collectives."""

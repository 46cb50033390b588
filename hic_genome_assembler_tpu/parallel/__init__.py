"""Mesh construction, sharding policy, and sharded matrix operations."""

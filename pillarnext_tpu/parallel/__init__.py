"""Parallelism: device mesh + sharding helpers."""

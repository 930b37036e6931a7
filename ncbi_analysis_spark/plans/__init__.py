"""Pipelines and the driver-contract query registry."""

"""Checkpoint manifest + per-partition lineage/metrics."""

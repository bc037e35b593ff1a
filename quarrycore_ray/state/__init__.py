"""Operational state: checkpoint manifests, lineage metrics."""

"""Input/output connectors."""

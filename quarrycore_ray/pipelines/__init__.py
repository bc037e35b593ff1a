"""End-to-end pipelines composed from `quarrycore_ray.stages`."""

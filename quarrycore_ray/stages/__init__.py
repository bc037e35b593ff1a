"""Pipeline stages: each is a batch transform or grouped transform over
`ray.data.Dataset`, composable into pipelines (see
`quarrycore_ray.pipelines`)."""

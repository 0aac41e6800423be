"""Device-mesh parallelism: voice and batch sharding over jax.sharding.Mesh."""

from .mesh import (  # noqa: F401
    make_mesh,
    pad_timelines,
    render_performance_sharded,
)

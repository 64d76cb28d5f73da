from .mesh import (  # noqa: F401
    constrain_image,
    factor_devices,
    image_sharding,
    image_spec,
    make_mesh,
    replicated,
    shard_image,
)

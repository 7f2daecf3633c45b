from . import (  # noqa: F401
    dedup,
    export,
    graphs,
    multimodal,
    network,
    pois,
    similarity,
    stats,
    tags,
    text,
    topology,
)

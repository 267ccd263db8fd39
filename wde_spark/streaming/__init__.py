from . import (  # noqa: F401
    cdc,
    dedup_admission,
    embedding_admission,
    quality_monitor,
    sketch_maintenance,
    stateful,
    versions,
    windows,
)

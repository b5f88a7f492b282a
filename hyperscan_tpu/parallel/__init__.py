from .sharded import (  # noqa: F401
    SHARD_AXIS,
    make_mesh,
    pad_batch_for_mesh,
    sharded_scan_counts,
    sharded_scan_matches,
    sharded_teddy_count,
)

"""hyperscan_tpu — a TPU-native multi-pattern regex/string matching engine.

A from-scratch rebuild of the capabilities of Intel Hyperscan
(multi-pattern PCRE-subset matching over blocks and streams) designed for
TPUs: pattern compilation on host (Python/C++), scanning as batched
JAX/XLA/Pallas programs, scaling across chips with jax.sharding.
"""

from .api import (  # noqa: F401
    alloc_scratch,
    clone_scratch,
    compile,
    compile_ext_multi,
    compile_lit,
    compile_lit_multi,
    compile_multi,
    database_info,
    database_size,
    deserialize_database,
    expression_ext_info,
    expression_info,
    hs_alloc_scratch,
    hs_clone_scratch,
    hs_compile,
    hs_compile_ext_multi,
    hs_compile_lit,
    hs_compile_lit_multi,
    hs_compile_multi,
    hs_database_info,
    hs_database_size,
    hs_deserialize_database,
    hs_expression_info,
    hs_scan,
    hs_serialize_database,
    hs_valid_platform,
    hs_version,
    hs_open_stream,
    hs_scan_stream,
    hs_close_stream,
    hs_reset_stream,
    hs_copy_stream,
    hs_compress_stream,
    hs_expand_stream,
    hs_reset_and_expand_stream,
    hs_scan_vector,
    open_stream,
    scan_stream,
    scan_streams,
    close_stream,
    reset_stream,
    copy_stream,
    compress_stream,
    expand_stream,
    reset_and_expand_stream,
    scan_vector,
    Stream,
    scan,
    scratch_size,
    serialize_database,
    serialized_database_info,
    serialized_database_size,
    valid_platform,
    version,
)
from .api import (  # noqa: F401
    populate_platform,
    set_allocator,
    set_database_allocator,
    set_misc_allocator,
    set_scratch_allocator,
    set_stream_allocator,
    hs_populate_platform,
    hs_set_allocator,
)
from .database import Database, PatternInfo  # noqa: F401
from .grey import Grey  # noqa: F401
from .errors import (  # noqa: F401
    CompileError,
    DbModeError,
    DbPlatformError,
    DbVersionError,
    HyperscanError,
    InvalidError,
    ScratchInUseError,
    HS_SUCCESS,
    HS_SCAN_TERMINATED,
)
from .flags import (  # noqa: F401
    ExprExt,
    HS_FLAG_ALLOWEMPTY,
    HS_FLAG_CASELESS,
    HS_FLAG_COMBINATION,
    HS_FLAG_DOTALL,
    HS_FLAG_MULTILINE,
    HS_FLAG_PREFILTER,
    HS_FLAG_QUIET,
    HS_FLAG_SINGLEMATCH,
    HS_FLAG_SOM_LEFTMOST,
    HS_FLAG_UCP,
    HS_FLAG_UTF8,
    HS_MODE_BLOCK,
    HS_MODE_STREAM,
    HS_MODE_VECTORED,
    UNBOUNDED,
)
from .runtime.scan import (  # noqa: F401
    Match,
    Scratch,
    scan_batch,
    scan_block_ranges,
    scan_count,
)
from .runtime.streamset import (  # noqa: F401
    StreamSet,
    close_streamset,
    open_streamset,
    scan_streamset,
    streamset_load,
    streamset_stream,
    streamset_write_finish,
    streamset_write_start,
)

__version__ = "0.1.0"

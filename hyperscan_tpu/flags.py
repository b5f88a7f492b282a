"""Pattern flags, scan modes and extended parameters.

Mirrors the reference's public compile surface:
- pattern flags   (reference: src/hs_compile.h:869-1005)
- scan modes      (reference: src/hs_compile.h:1156-1210)
- extended params (reference: src/hs_compile.h:227-292)
"""

from __future__ import annotations

import dataclasses

# --- Pattern flags (reference: src/hs_compile.h:869-1005) ------------------
HS_FLAG_CASELESS = 1
HS_FLAG_DOTALL = 2
HS_FLAG_MULTILINE = 4
HS_FLAG_SINGLEMATCH = 8
HS_FLAG_ALLOWEMPTY = 16
HS_FLAG_UTF8 = 32
HS_FLAG_UCP = 64
HS_FLAG_PREFILTER = 128
HS_FLAG_SOM_LEFTMOST = 256
HS_FLAG_COMBINATION = 512
HS_FLAG_QUIET = 1024

ALL_PATTERN_FLAGS = (
    HS_FLAG_CASELESS
    | HS_FLAG_DOTALL
    | HS_FLAG_MULTILINE
    | HS_FLAG_SINGLEMATCH
    | HS_FLAG_ALLOWEMPTY
    | HS_FLAG_UTF8
    | HS_FLAG_UCP
    | HS_FLAG_PREFILTER
    | HS_FLAG_SOM_LEFTMOST
    | HS_FLAG_COMBINATION
    | HS_FLAG_QUIET
)

# --- Scan modes (reference: src/hs_compile.h:1156-1210) --------------------
HS_MODE_BLOCK = 1
HS_MODE_NOSTREAM = HS_MODE_BLOCK
HS_MODE_STREAM = 2
HS_MODE_VECTORED = 4
HS_MODE_SOM_HORIZON_LARGE = 1 << 24
HS_MODE_SOM_HORIZON_MEDIUM = 1 << 25
HS_MODE_SOM_HORIZON_SMALL = 1 << 26

# reported as `from` when a streaming match started before the database's
# SOM horizon (reference: hs_runtime.h:615 HS_OFFSET_PAST_HORIZON)
HS_OFFSET_PAST_HORIZON = (1 << 64) - 1


def som_horizon_span(mode: int):
    """Maximum (to - from) distance representable under the database's
    SOM horizon mode; None = unlimited (reference: hs_compile.h:1184-1210
    precision tiers)."""
    if mode & HS_MODE_SOM_HORIZON_SMALL:
        return (1 << 16) - 1
    if mode & HS_MODE_SOM_HORIZON_MEDIUM:
        return (1 << 32) - 1
    return None

_MODE_MASK = HS_MODE_BLOCK | HS_MODE_STREAM | HS_MODE_VECTORED

# --- Extended-param flags (reference: src/hs_compile.h:227-292) ------------
HS_EXT_FLAG_MIN_OFFSET = 1
HS_EXT_FLAG_MAX_OFFSET = 2
HS_EXT_FLAG_MIN_LENGTH = 4
HS_EXT_FLAG_EDIT_DISTANCE = 8
HS_EXT_FLAG_HAMMING_DISTANCE = 16

# Sentinel for "no max offset" (reference uses MAX_OFFSET unset == UINT64_MAX)
UNBOUNDED = 2**63 - 1


@dataclasses.dataclass(frozen=True)
class ExprExt:
    """Extended pattern parameters (``hs_expr_ext_t``).

    Reference: src/hs_compile.h:227-292. All bounds are inclusive, offsets
    are the end offset ("to") of a match.
    """

    min_offset: int = 0
    max_offset: int = UNBOUNDED
    min_length: int = 0
    edit_distance: int = 0
    hamming_distance: int = 0

    @property
    def is_trivial(self) -> bool:
        return (
            self.min_offset == 0
            and self.max_offset == UNBOUNDED
            and self.min_length == 0
            and self.edit_distance == 0
            and self.hamming_distance == 0
        )


def base_mode(mode: int) -> int:
    """Extract the block/stream/vectored bit out of a mode word."""
    return mode & _MODE_MASK


def validate_mode(mode: int) -> None:
    from .errors import InvalidError

    m = base_mode(mode)
    if m not in (HS_MODE_BLOCK, HS_MODE_STREAM, HS_MODE_VECTORED):
        raise InvalidError(f"invalid mode {mode:#x}: exactly one of "
                           "BLOCK/STREAM/VECTORED must be set")
    horizon = mode & (
        HS_MODE_SOM_HORIZON_LARGE
        | HS_MODE_SOM_HORIZON_MEDIUM
        | HS_MODE_SOM_HORIZON_SMALL
    )
    if horizon and m != HS_MODE_STREAM:
        raise InvalidError("SOM horizon modes only apply to streaming")
    if horizon & (horizon - 1):
        raise InvalidError("at most one SOM horizon mode may be set")


def validate_flags(flags: int, index: int = -1) -> None:
    from .errors import CompileError

    if flags & ~ALL_PATTERN_FLAGS:
        raise CompileError(f"unrecognized flag bits {flags & ~ALL_PATTERN_FLAGS:#x}",
                           index)

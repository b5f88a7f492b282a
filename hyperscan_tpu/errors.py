"""Error codes and exceptions.

TPU-native analogue of the reference's error model:
- error codes mirror ``hs_error_t`` values (reference: src/hs_common.h:507-566)
- compile failures carry the failing expression index like
  ``hs_compile_error_t`` (reference: src/hs_compile.h:94-118)
"""

from __future__ import annotations

# hs_error_t analogues (reference: src/hs_common.h:507-566)
HS_SUCCESS = 0
HS_INVALID = -1
HS_NOMEM = -2
HS_SCAN_TERMINATED = -3
HS_COMPILER_ERROR = -4
HS_DB_VERSION_ERROR = -5
HS_DB_PLATFORM_ERROR = -6
HS_DB_MODE_ERROR = -7
HS_BAD_ALIGN = -8
HS_BAD_ALLOC = -9
HS_SCRATCH_IN_USE = -10
HS_ARCH_ERROR = -11
HS_INSUFFICIENT_SPACE = -12
HS_UNKNOWN_ERROR = -13


class HyperscanError(Exception):
    """Base class for all errors raised by hyperscan_tpu."""

    code = HS_UNKNOWN_ERROR


class InvalidError(HyperscanError):
    """A parameter passed to a function was invalid (HS_INVALID)."""

    code = HS_INVALID


class CompileError(HyperscanError):
    """Pattern compilation failed.

    Mirrors ``hs_compile_error_t`` (reference: src/hs_compile.h:94-118):
    carries a message and the index of the failing expression (or -1 if
    the error is not specific to one expression).
    """

    code = HS_COMPILER_ERROR

    def __init__(self, message: str, expression: int = -1):
        super().__init__(message)
        self.message = message
        self.expression = expression

    def __str__(self) -> str:  # pragma: no cover - trivial
        if self.expression >= 0:
            return f"{self.message} (expression {self.expression})"
        return self.message


class DbVersionError(HyperscanError):
    code = HS_DB_VERSION_ERROR


class DbPlatformError(HyperscanError):
    code = HS_DB_PLATFORM_ERROR


class DbModeError(HyperscanError):
    """Database built for a different scan mode (HS_DB_MODE_ERROR)."""

    code = HS_DB_MODE_ERROR


class ScratchInUseError(HyperscanError):
    code = HS_SCRATCH_IN_USE


class InsufficientSpaceError(HyperscanError):
    code = HS_INSUFFICIENT_SPACE


class ScanTerminated(Exception):
    """Internal control-flow signal: a callback returned nonzero.

    Matches the reference semantics where a nonzero callback return stops
    scanning and hs_scan returns HS_SCAN_TERMINATED
    (reference: src/hs_runtime.h:78-96).
    """

    code = HS_SCAN_TERMINATED

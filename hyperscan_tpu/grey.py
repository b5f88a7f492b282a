"""Grey box — internal compile tunables with string overrides.

Reference: src/grey.h (121 tunables: engine enables, decomposition
thresholds, resource limits) threaded through every compile stage via
CompileContext, with `name:value;` override parsing in
applyGreyOverrides (src/grey.cpp:177).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class Grey:
    # engine enables
    allow_teddy: bool = True            # literal prefilter path
    allow_validators: bool = True       # window validation DFAs
    allow_limex: bool = True            # bit-NFA fallback for DFA blowups
    # graph passes
    reduce_graphs: bool = True          # floating-start redundancy pass
    # decomposition thresholds (compiler/literals.py)
    min_factor_len: int = 3
    max_factor_len: int = 16
    max_window: int = 1024
    # resource limits
    max_dfa_states: int = 60000
    validator_max_states: int = 4000
    max_positions: int = 50000
    max_fuzzy_positions: int = 30000
    max_repeat: int = 32767
    # runtime policy
    host_scan_limit: int = 1 << 17      # small-write threshold (bytes)
    match_capacity: int = 1 << 14       # device match-buffer slots

    def apply_overrides(self, text: str) -> "Grey":
        """Parse `name:value;name:value` overrides (reference:
        applyGreyOverrides, src/grey.cpp:177)."""
        out = dataclasses.replace(self)
        for part in text.split(";"):
            part = part.strip()
            if not part:
                continue
            if ":" not in part:
                raise ValueError(f"bad grey override {part!r}")
            name, val = part.split(":", 1)
            name = name.strip()
            if not hasattr(out, name):
                raise ValueError(f"unknown grey tunable {name!r}")
            cur = getattr(out, name)
            if isinstance(cur, bool):
                setattr(out, name, val.strip() not in ("0", "false", "False"))
            else:
                setattr(out, name, int(val, 0))
        return out


DEFAULT_GREY = Grey()

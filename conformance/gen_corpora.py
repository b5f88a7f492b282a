"""Generate the checked-in file corpora for the canonical battery.

Reference analogue: tools/hscollider test_cases/corpora — curated file
corpora keyed to the signature files. Corpora here are deterministic
(seeded) so the checked-in bytes are reproducible:

    python conformance/gen_corpora.py   # rewrites conformance/corpora/

Each corpus mixes pseudo-text lines with planted pattern fragments
(literal factors + NFA accept-path walks from conformance/signatures.txt)
and near-miss prefixes, at densities that exercise the confirm and
validation stages, not just the filter.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hyperscan_tpu.compiler.literals import extract_factors  # noqa: E402
from hyperscan_tpu.compiler.parser import parse  # noqa: E402
from hyperscan_tpu.tools.hscheck import parse_line  # noqa: E402
from hyperscan_tpu.tools.hscollider import _nfa_walks  # noqa: E402

WORDS = (
    b"the quick brown fox jumps over lazy dog packet header payload "
    b"request response stream match engine filter confirm corpus write "
    b"alpha beta gamma delta report offset state table bucket chunk"
).split()


def _entries():
    path = os.path.join(os.path.dirname(__file__), "signatures.txt")
    out = []
    with open(path, "r", errors="replace") as f:
        for line in f:
            parsed = parse_line(line)
            if parsed:
                out.append(parsed)
    return out


def _fragments(entries, rng):
    frags = []
    for (_id, pat, flags) in entries:
        try:
            fs = extract_factors(parse(pat, flags))
        except Exception:
            continue
        for fi in fs or []:
            frags.append(bytes(a.value for a in fi.factor.atoms))
        frags.extend(_nfa_walks(pat, flags, rng, n_walks=2, max_len=120))
    return [f for f in frags if f]


def _text_line(rng, frags, plant_p):
    parts = []
    for _ in range(int(rng.integers(4, 12))):
        if frags and rng.random() < plant_p:
            parts.append(frags[int(rng.integers(0, len(frags)))])
        else:
            parts.append(WORDS[int(rng.integers(0, len(WORDS)))])
    return b" ".join(parts)


def build(kind: str, size: int, seed: int, frags) -> bytes:
    rng = np.random.default_rng(seed)
    blob = bytearray()
    while len(blob) < size:
        if kind == "text":
            blob += _text_line(rng, frags, 0.08) + b"\n"
        elif kind == "logs":
            ts = (f"{int(rng.integers(0, 24)):02d}:"
                  f"{int(rng.integers(0, 60)):02d}:"
                  f"{int(rng.integers(0, 60)):02d}Z ").encode()
            blob += ts + _text_line(rng, frags, 0.15) + b"\n"
        else:  # mixed: binary noise runs + planted fragments + digits
            n = int(rng.integers(20, 120))
            blob += rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            if frags and rng.random() < 0.5:
                blob += frags[int(rng.integers(0, len(frags)))]
            if rng.random() < 0.3:
                blob += rng.integers(48, 58, int(rng.integers(30, 90)),
                                     dtype=np.uint8).tobytes()
    return bytes(blob[:size])


def main():
    here = os.path.dirname(__file__)
    outdir = os.path.join(here, "corpora")
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(12345)
    frags = _fragments(_entries(), rng)
    for kind, size, seed in (("text", 12288, 1), ("logs", 8192, 2),
                             ("mixed", 16384, 3)):
        data = build(kind, size, seed, frags)
        with open(os.path.join(outdir, f"{kind}.bin"), "wb") as f:
            f.write(data)
        print(f"{kind}.bin: {len(data)} bytes")


if __name__ == "__main__":
    main()

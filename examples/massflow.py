"""massflow — thousands of concurrent streams through the StreamSet bulk API.

Reference analogue: a high-stream-count hsbench STREAM run (the docs'
8,891-stream sample corpus, doc/dev-reference/tools.rst:70-73), but
driven through the TPU-native bulk path: every round, ALL streams'
history+write extents are filtered in ONE fused device dispatch, rounds
pipeline (dispatch round k+1 before finishing round k), and one batched
fetch collects a whole pipeline of results (~30 ms tunnel latency paid
once, not per round).

flowscan.py is the small-scale sibling (per-stream scan_streams calls);
this example is the shape production deployments use past ~a few
hundred streams.

Usage: python examples/massflow.py <pattern_file> [streams] [rounds]
  pattern_file: one `id:/pattern/flags` per line (hscheck format)
  streams:      concurrent stream count (default 1024)
  rounds:       write rounds of 4 KiB per stream (default 8)
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import hyperscan_tpu as hs
from hyperscan_tpu.runtime.streamset import (
    close_streamset,
    open_streamset,
    streamset_write_finish,
    streamset_write_start,
)
from hyperscan_tpu.tools.hscheck import parse_line


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    W = 4096

    pats, ids, flags = [], [], []
    for line in pathlib.Path(sys.argv[1]).read_text().splitlines():
        parsed = parse_line(line)
        if parsed is None:
            continue
        i, p, f = parsed
        pats.append(p)
        ids.append(i)
        flags.append(f)
    db = hs.compile_multi(pats, ids=ids, flags=flags,
                          mode=hs.HS_MODE_STREAM)

    # plantable witnesses: the pure-literal patterns' own text (regex
    # patterns would need a synthesized witness — out of scope here)
    lits = [p.encode() for p in pats
            if p.isascii() and all(c.isalnum() or c in " _-" for c in p)]
    rng = np.random.default_rng(0)
    ss = open_streamset(db, S)
    total = 0
    # pipeline: dispatch every round's device work before finishing the
    # first — finish MUST run in write order (it advances carried state)
    pending = []
    for r in range(rounds):
        writes = []
        for s in range(S):
            buf = (32 + rng.integers(0, 95, size=W)).astype(np.uint8)
            if (r * S + s) % 97 == 0 and lits:
                lit = lits[s % len(lits)]
                buf[100:100 + len(lit)] = np.frombuffer(lit, np.uint8)
            writes.append(buf.tobytes())
        pending.append(streamset_write_start(db, ss, writes))
        if len(pending) >= 2:  # keep one round in flight
            total += sum(len(m) for m in
                         streamset_write_finish(db, ss, pending.pop(0)))
    for h in pending:
        total += sum(len(m) for m in streamset_write_finish(db, ss, h))
    total += sum(len(m) for m in close_streamset(db, ss))
    print(f"{S} streams x {rounds} x {W} B: {total} matches")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""flowscan — streaming scan with one stream per flow, batched writes.

Reference analogue: examples/pcapscan.cc (stream-per-flow over packet
payloads), without the pcap dependency: the input is a text file where
each line is `<flow_id> <payload>`; payloads of the same flow form one
logical stream, and each "round" of packets is scanned as one batched
device dispatch (hs.scan_streams — the TPU-native entry point).

Usage: python examples/flowscan.py <pattern_file> <flows.txt>
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from collections import defaultdict

import hyperscan_tpu as hs
from hyperscan_tpu.tools.hscheck import parse_line


def main() -> int:
    if len(sys.argv) != 3:
        print(f"usage: {sys.argv[0]} <pattern_file> <flows.txt>")
        return 2
    entries = []
    with open(sys.argv[1]) as f:
        for line in f:
            p = parse_line(line)
            if p:
                entries.append(p)
    db = hs.compile_multi(
        [p for (_i, p, _f) in entries],
        flags=[f for (_i, _p, f) in entries],
        ids=[i for (i, _p, _f) in entries],
        mode=hs.HS_MODE_STREAM,
    )

    flows = defaultdict(list)
    order = []
    with open(sys.argv[2], "rb") as f:
        for line in f:
            if not line.strip():
                continue
            fid, _, payload = line.partition(b" ")
            if fid not in flows:
                order.append(fid)
            flows[fid].append(payload.rstrip(b"\n"))

    streams = {fid: hs.open_stream(db) for fid in order}
    nmatches = 0
    round_no = 0
    while True:
        batch = [(fid, flows[fid][round_no]) for fid in order
                 if round_no < len(flows[fid])]
        if not batch:
            break
        results = hs.scan_streams(
            db, [streams[fid] for (fid, _c) in batch],
            [c for (_f, c) in batch],
        )
        for (fid, _c), ms in zip(batch, results):
            for (pid, _frm, to) in ms:
                print(f"flow {fid.decode()} pattern {pid} @ {to}")
                nmatches += 1
        round_no += 1
    for fid in order:
        for (pid, _frm, to) in hs.close_stream(streams[fid]):
            print(f"flow {fid.decode()} pattern {pid} @ {to} (EOD)")
            nmatches += 1
    print(f"{nmatches} matches across {len(order)} flows")
    return 0


if __name__ == "__main__":
    sys.exit(main())

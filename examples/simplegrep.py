"""simplegrep — block-mode single-pattern scan of a file.

Reference analogue: examples/simplegrep.c (:172-199).

Usage: python examples/simplegrep.py <pattern> <file>
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import hyperscan_tpu as hs


def main() -> int:
    if len(sys.argv) != 3:
        print(f"usage: {sys.argv[0]} <pattern> <file>")
        return 2
    pattern, path = sys.argv[1], sys.argv[2]
    db = hs.compile(pattern)
    with open(path, "rb") as f:
        data = f.read()

    def on_match(pat_id, frm, to, flags):
        print(f"Match for pattern {pattern!r} at offset {to}")
        return 0

    hs.scan(db, data, callback=on_match)
    return 0


if __name__ == "__main__":
    sys.exit(main())

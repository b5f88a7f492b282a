"""Host (small-write) vs device path equivalence.

The host path handles batches under HOST_SCAN_LIMIT (reference analogue:
runSmallWriteEngine); this test forces both paths over identical data and
diffs the match sets, so the device kernels stay covered even though most
unit tests fall under the threshold."""

import numpy as np
import pytest

import hyperscan_tpu as hs
from hyperscan_tpu.runtime import smallwrite


@pytest.fixture(scope="module")
def db():
    return hs.compile_multi(
        [r"attack[0-9]{2}", r"foo[a-z]+bar", r"shellz"],
        ids=[1, 2, 3],
    )


def _corpus(n):
    rng = np.random.default_rng(3)
    data = rng.integers(97, 123, size=n, dtype=np.uint8).tobytes()
    return (
        data[: n // 2]
        + b"attack42 foozzzbar shellz"
        + data[n // 2 :]
    )


def test_device_equals_host(db, monkeypatch):
    blob = _corpus(smallwrite.HOST_SCAN_LIMIT * 2)  # over the limit

    want_small = []
    big = hs.scan(db, blob)  # device path (blob exceeds limit)
    monkeypatch.setattr(smallwrite, "HOST_SCAN_LIMIT", 1 << 62)
    host = hs.scan(db, blob)  # forced host path
    assert big == host
    assert any(m[0] == 1 for m in big)
    assert any(m[0] == 2 for m in big)
    assert any(m[0] == 3 for m in big)


def test_stream_device_equals_host(db, monkeypatch):
    sdb = hs.compile_multi(
        [r"attack[0-9]{2}", r"foo[a-z]+bar"], ids=[1, 2],
        mode=hs.HS_MODE_STREAM,
    )
    blob = _corpus(smallwrite.HOST_SCAN_LIMIT + 4096)
    cut = len(blob) // 2

    def run():
        st = hs.open_stream(sdb)
        ms = hs.scan_stream(st, blob[:cut])
        ms += hs.scan_stream(st, blob[cut:])
        ms += hs.close_stream(st)
        return ms

    dev = run()
    monkeypatch.setattr(smallwrite, "HOST_SCAN_LIMIT", 1 << 62)
    hostms = run()
    assert dev == hostms and any(m[0] == 1 for m in dev)

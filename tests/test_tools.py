"""Tool smoke tests (hscheck / hscollider / hsbench analogues)."""

import numpy as np
import pytest

from hyperscan_tpu.tools import hsbench, hscheck, hscollider


@pytest.fixture()
def patfile(tmp_path):
    p = tmp_path / "pats.txt"
    p.write_text(
        "1:/attack[0-9]+/\n"
        "2:/foo(bar|baz)/i\n"
        "# comment\n"
        "3:/err(or)?/\n"
    )
    return str(p)


@pytest.fixture()
def corpusfile(tmp_path):
    rng = np.random.default_rng(0)
    blob = bytearray(rng.integers(32, 127, 50000, dtype=np.uint8).tobytes())
    blob[100:108] = b"attack42"
    blob[5000:5006] = b"FOOBAR"
    f = tmp_path / "corpus.bin"
    f.write_bytes(bytes(blob))
    return str(f)


def test_hscheck_ok(patfile, capsys):
    assert hscheck.main([patfile]) == 0
    assert "3 compiled, 0 failed" in capsys.readouterr().out


def test_hscheck_reports_bad(tmp_path, capsys):
    p = tmp_path / "bad.txt"
    p.write_text("1:/good/\n2:/a{5,2}/\n")
    assert hscheck.main([str(p)]) == 1
    out = capsys.readouterr().out
    assert "FAIL line 2" in out


def test_hscollider_consistent(patfile, capsys):
    assert hscollider.main([patfile, "--seed", "3"]) == 0
    assert "all consistent" in capsys.readouterr().out


def test_hsbench_runs(patfile, corpusfile, capsys):
    assert hsbench.main(
        ["-e", patfile, "-c", corpusfile, "--repeats", "1",
         "--block-size", "8192"]
    ) == 0
    out = capsys.readouterr().out
    assert "Overall throughput" in out and "Matches" in out

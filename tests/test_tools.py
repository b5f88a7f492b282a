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
        "4:/[ab]+c[de]+/\n"
        "5:/gatex(ab|cd)*doorq/\n"     # general-infix chain
        "6:/num[0-9]{2,4}tail/L\n"     # SOM triples
        "7:/lead[a-z]*mark7/\n"        # class-gap chain
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
    assert "7 compiled, 0 failed" in capsys.readouterr().out


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


def test_hsdump(patfile, capsys):
    from hyperscan_tpu.tools import hsdump
    assert hsdump.main([patfile]) == 0
    out = capsys.readouterr().out
    assert "Literal engine" in out and "DFA engine" in out


def test_grey_overrides():
    from hyperscan_tpu.grey import Grey
    from hyperscan_tpu.database import compile_patterns

    g = Grey().apply_overrides("allow_teddy:0;max_dfa_states:1000")
    assert not g.allow_teddy and g.max_dfa_states == 1000
    db = compile_patterns([r"attack"], ids=[1], grey=g)
    # teddy disabled: even a pure literal lands on the general engines
    assert db.lit is None and db.engines
    import hyperscan_tpu as hs
    assert hs.scan(db, b"an attack!") == [(1, 0, 9)]


def test_platform_and_allocators():
    import hyperscan_tpu as hs
    info = hs.populate_platform()
    assert info["num_devices"] >= 1
    hs.set_allocator(lambda n: bytearray(n), lambda b: None)


def test_fuzz_rounds():
    import numpy as np

    from hyperscan_tpu.tools.fuzz import fuzz_round

    rng = np.random.default_rng(99)
    for _ in range(3):
        assert fuzz_round(rng, n_patterns=5, n_corpora=4) == []


def test_corpus_builder_roundtrip(tmp_path, capsys):
    from hyperscan_tpu.tools import corpus, hsbench

    src = tmp_path / "data.bin"
    src.write_bytes(b"attack42 " * 500)
    out = tmp_path / "corpus.db"
    assert corpus.main([str(out), "--from-file", str(src),
                        "--block-size", "512",
                        "--blocks-per-stream", "3"]) == 0
    blocks, groups = hsbench.load_sqlite_corpus(str(out))
    assert sum(len(b) for b in blocks) == 4500
    assert all(len(g) <= 3 for g in groups)
    # and hsbench consumes it in stream mode
    p = tmp_path / "pats.txt"
    p.write_text("1:/attack[0-9]+/\n")
    assert hsbench.main(["-e", str(p), "-c", str(out),
                         "--mode", "stream", "--repeats", "1"]) == 0
    assert "Overall throughput" in capsys.readouterr().out

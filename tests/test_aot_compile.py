"""Smoke coverage for tools/aot_compile.py (the TRT/CoreML engine-build
analog, reference depth.py:1841-1862): the CLI must build, compile, and
prime every requested capture shape without touching a TPU."""

import io
import pytest
import contextlib

from desktop2stereo_tpu.tools.aot_compile import main


@pytest.mark.slow
def test_aot_compile_smoke(tmp_path, monkeypatch):
    monkeypatch.setenv("D2S_COMPILE_CACHE", str(tmp_path / "xla"))
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = main([
            "--model", "Depth-Anything-V2-Small",
            "--depth-res", "126",
            "--shapes", "64x96,72x96",
            "--output-resolution", "64",
            "--quality", "fast",
        ])
    text = out.getvalue()
    assert rc == 0
    assert "64x96: compiled+primed" in text
    assert "72x96: compiled+primed" in text
    assert "done" in text

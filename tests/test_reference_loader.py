"""Unit tests for the AST oracle extractor itself (tests/reference_loader.py).

The extractor turns reference source into test oracles; a bug here silently
breaks every tier-2 parity test (as the guarded torch.compile rebind of
make_sbs_core did, reference depth.py:2233-2235).  Pin its rules against a
synthetic file so regressions surface directly, not as parity noise.
"""

import textwrap

import pytest

from tests import reference_loader


@pytest.fixture
def fake_reference(tmp_path, monkeypatch):
    """Point the loader at a synthetic reference tree; returns the root."""
    monkeypatch.setattr(reference_loader, "REFERENCE_ROOT", str(tmp_path))
    return tmp_path


def _write(root, rel, src):
    p = root / rel
    p.write_text(textwrap.dedent(src))
    return rel


def test_first_definition_wins_over_guarded_rebind(fake_reference):
    """A later conditional rebind (the reference's torch.compile wrap) must
    not shadow the extracted def — its RHS isn't in the namespace."""
    rel = _write(fake_reference, "mod.py", """
        def f(x):
            return x + 1

        if SOME_PLATFORM_FLAG:
            f = wrap_with_compiler(f)
        """)
    ns = reference_loader.load_reference_functions(rel, ["f"])
    assert ns["f"](1) == 2


def test_assignment_oracle_extracted(fake_reference):
    """Plain top-level assignments (kernel caches etc.) still extract."""
    rel = _write(fake_reference, "mod.py", """
        CACHE = {"k": 3}

        def g(x):
            return x * CACHE["k"]
        """)
    ns = reference_loader.load_reference_functions(rel, ["g", "CACHE"])
    assert ns["g"](2) == 6


def test_branch_guarded_def_found(fake_reference):
    """Defs inside top-level platform `if` bodies are reachable (the
    reference's IS_CUDA-guarded process(), depth.py:540)."""
    rel = _write(fake_reference, "mod.py", """
        if IS_SOME_BACKEND:
            def h(x):
                return "gpu"
        else:
            def h_cpu(x):
                return "cpu"
        """)
    ns = reference_loader.load_reference_functions(rel, ["h_cpu"])
    assert ns["h_cpu"](0) == "cpu"


def test_missing_name_raises(fake_reference):
    """A renamed/removed reference symbol fails loudly, telling us to
    update the parity tests rather than silently skipping them."""
    rel = _write(fake_reference, "mod.py", "def present(): pass\n")
    with pytest.raises(AssertionError, match="no longer defines"):
        reference_loader.load_reference_functions(rel, ["absent"])


def test_partially_new_chained_assign_keeps_first_definition(fake_reference):
    """`A = B = rhs` where A is already extracted: B must still be bound,
    but A's first definition must survive (the rewritten node binds only
    the not-yet-found targets)."""
    rel = _write(fake_reference, "mod.py", """
        A = 1

        A = B = 2
        """)
    ns = reference_loader.load_reference_functions(rel, ["A", "B"])
    assert ns["A"] == 1
    assert ns["B"] == 2


def test_first_def_wins_across_branches(fake_reference):
    """Two same-named defs in different branches: the first found wins
    (callers select a branch by naming symbols unique to it)."""
    rel = _write(fake_reference, "mod.py", """
        if FLAG:
            def pick(x):
                return "first"

        def pick(x):
            return "second"
        """)
    ns = reference_loader.load_reference_functions(rel, ["pick"])
    assert ns["pick"](0) == "first"

"""Hygiene: every package module carries a docstring (our analogue of the reference's
copyright-header scan, tests/test_headers.py)."""

import ast
import pathlib

PKG = pathlib.Path(__file__).parent.parent / "aurora_tpu"


def test_every_module_has_docstring():
    missing = []
    for path in PKG.rglob("*.py"):
        tree = ast.parse(path.read_text())
        if path.stat().st_size > 0 and ast.get_docstring(tree) is None:
            if path.name != "__init__.py":
                missing.append(str(path))
    assert not missing, f"modules without docstrings: {missing}"

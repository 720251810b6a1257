"""Every example script must execute end-to-end (the reference treats
example scripts as its de-facto user surface, SURVEY.md L7).  Scripts
expose a ``main()`` with small-size defaults so the whole sweep runs on
CPU in well under a minute per script."""

import importlib.util
import os
import sys

import pytest

_EX_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")
_SCRIPTS = sorted(f for f in os.listdir(_EX_DIR) if f.endswith(".py"))


def _load(name):
    path = os.path.join(_EX_DIR, name)
    spec = importlib.util.spec_from_file_location(
        f"example_{name[:-3]}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("script", _SCRIPTS)
def test_example_runs(script):
    mod = _load(script)
    assert hasattr(mod, "main"), f"{script} has no main()"
    mod.main()

"""The notebook forms of the example scripts (tools/build_notebooks.py)
must stay in sync with the scripts and be structurally valid."""

import ast
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EX = os.path.join(REPO, "examples")
NB = os.path.join(EX, "notebooks")


def test_every_example_has_a_notebook():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    scripts = {f[:-3] for f in os.listdir(EX) if f.endswith(".py")}
    notebooks = {f[:-6] for f in os.listdir(NB)
                 if f.endswith(".ipynb")}
    assert scripts == notebooks


def test_notebooks_valid_and_current():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import build_notebooks as bn
    for f in sorted(os.listdir(NB)):
        if not f.endswith(".ipynb"):
            continue
        nb = json.load(open(os.path.join(NB, f)))
        assert nb["nbformat"] == 4
        codes = [c for c in nb["cells"] if c["cell_type"] == "code"]
        assert codes and codes[-1]["source"] == "main()"
        ast.parse(codes[0]["source"])
        # regeneration is idempotent (notebooks match their scripts)
        expect = bn._cells(os.path.join(EX, f[:-6] + ".py"))
        assert nb["cells"] == expect, f"{f} is stale; run " \
            "python tools/build_notebooks.py"

"""Generate Jupyter notebook forms of the example scripts.

The reference ships notebook versions of its example scripts generated
by its docs machinery (``/root/reference/docs/source/examples``); this
is the equivalent generator: each ``examples/*.py`` becomes an
``examples/notebooks/*.ipynb`` with the module docstring as a markdown
cell and the code as a code cell that calls ``main()``.

Usage: python tools/build_notebooks.py [script.py ...]   (default: all)
"""

import ast
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
EX = os.path.join(REPO, "examples")
OUT = os.path.join(EX, "notebooks")


def _cells(path):
    src = open(path).read()
    tree = ast.parse(src)
    doc = ast.get_docstring(tree) or ""
    # code = source minus the module docstring and the __main__ guard
    lines = src.splitlines()
    body = [n for n in tree.body]
    start = 0
    if (body and isinstance(body[0], ast.Expr)
            and isinstance(body[0].value, ast.Constant)):
        start = body[0].end_lineno
    end = len(lines)
    for n in body:
        if (isinstance(n, ast.If) and isinstance(n.test, ast.Compare)
                and getattr(n.test.left, "id", "") == "__name__"):
            end = n.lineno - 1
    code = "\n".join(lines[start:end]).strip("\n")
    cells = []
    if doc:
        title = os.path.basename(path)
        cells.append({"cell_type": "markdown", "metadata": {},
                      "source": f"# {title}\n\n{doc}"})
    cells.append({"cell_type": "code", "metadata": {},
                  "execution_count": None, "outputs": [],
                  "source": code})
    cells.append({"cell_type": "code", "metadata": {},
                  "execution_count": None, "outputs": [],
                  "source": "main()"})
    return cells


def build(name):
    nb = {
        "nbformat": 4, "nbformat_minor": 5,
        "metadata": {"kernelspec": {"name": "python3",
                                    "display_name": "Python 3",
                                    "language": "python"},
                     "language_info": {"name": "python"}},
        "cells": _cells(os.path.join(EX, name)),
    }
    os.makedirs(OUT, exist_ok=True)
    out = os.path.join(OUT, name[:-3] + ".ipynb")
    with open(out, "w") as f:
        json.dump(nb, f, indent=1)
    return out


def main(argv):
    names = argv or sorted(f for f in os.listdir(EX)
                           if f.endswith(".py"))
    for name in names:
        build(name)
    print(f"wrote {len(names)} notebooks to {OUT}")


if __name__ == "__main__":
    main(sys.argv[1:])

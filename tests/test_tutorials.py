"""Every python code block in docs/tutorials/*.md must execute.

Blocks within one page run in a shared namespace, top to bottom, so a
tutorial reads as one continuous, verified session (the analogue of
the reference's Sphinx-tested example docs)."""

import os
import re

import pytest

_TUT_DIR = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "tutorials")
_PAGES = sorted(f for f in os.listdir(_TUT_DIR) if f.endswith(".md"))

_BLOCK = re.compile(r"```python\n(.*?)```", re.S)


@pytest.mark.parametrize("page", _PAGES)
def test_tutorial_blocks_execute(page):
    with open(os.path.join(_TUT_DIR, page)) as f:
        text = f.read()
    blocks = _BLOCK.findall(text)
    assert blocks, f"{page} has no python blocks"
    ns = {}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"{page}[block {i}]", "exec"), ns)
        except Exception as e:
            raise AssertionError(
                f"{page} block {i} failed: {e}\n---\n{block}") from e

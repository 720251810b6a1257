"""Render the markdown documentation to a static HTML site.

Converts README.md, docs/*.md and docs/tutorials/*.md into
``docs/html/`` with a navigation sidebar — the analogue of the
reference's rendered Sphinx build (``/root/reference/docs/source``),
using the python-markdown package available in this image.

Usage: python tools/build_docs_html.py  ->  docs/html/index.html
"""

import os
import re
import shutil

import markdown

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
OUT = os.path.join(REPO, "docs", "html")

PAGES = [
    ("index", os.path.join(REPO, "README.md"), "Overview"),
    ("architecture", os.path.join(REPO, "docs", "architecture.md"),
     "Architecture"),
    ("migration", os.path.join(REPO, "docs", "migration.md"),
     "Migrating from SPORCO"),
    ("performance", os.path.join(REPO, "docs", "performance.md"),
     "Performance"),
    ("tut_sparse_coding",
     os.path.join(REPO, "docs", "tutorials", "sparse_coding.md"),
     "Tutorial: sparse coding (ADMM)"),
    ("tut_pgm", os.path.join(REPO, "docs", "tutorials", "pgm.md"),
     "Tutorial: PGM / FISTA"),
    ("tut_dictlearn",
     os.path.join(REPO, "docs", "tutorials", "dictionary_learning.md"),
     "Tutorial: dictionary learning"),
    ("tut_parallel",
     os.path.join(REPO, "docs", "tutorials", "parallel.md"),
     "Tutorial: parallelism"),
    ("api", os.path.join(REPO, "docs", "api.md"), "API reference"),
]

CSS = """
body { margin: 0; font: 15px/1.55 system-ui, sans-serif; color: #222; }
.wrap { display: flex; }
nav { min-width: 230px; background: #f6f8fa; padding: 1.2em;
      border-right: 1px solid #ddd; min-height: 100vh; }
nav a { display: block; color: #0757a8; text-decoration: none;
        padding: 0.18em 0; }
nav a.current { font-weight: 600; }
main { padding: 1.5em 3em; max-width: 54em; }
pre { background: #f6f8fa; padding: 0.8em; overflow-x: auto;
      border-radius: 6px; }
code { background: #f2f3f5; padding: 0.1em 0.25em; border-radius: 4px;
       font-size: 0.92em; }
pre code { background: none; padding: 0; }
table { border-collapse: collapse; }
th, td { border: 1px solid #ccc; padding: 0.3em 0.6em; }
h1, h2 { border-bottom: 1px solid #eee; padding-bottom: 0.2em; }
"""


def _fix_links(html):
    """Point intra-repo markdown links at the rendered pages."""
    mapping = {
        "docs/performance.md": "performance.html",
        "docs/architecture.md": "architecture.html",
        "docs/migration.md": "migration.html",
        "docs/api.md": "api.html",
        "docs/tutorials/sparse_coding.md": "tut_sparse_coding.html",
        "docs/tutorials/pgm.md": "tut_pgm.html",
        "docs/tutorials/dictionary_learning.md": "tut_dictlearn.html",
        "docs/tutorials/parallel.md": "tut_parallel.html",
    }
    for src, dst in mapping.items():
        html = html.replace(f'href="{src}"', f'href="{dst}"')
    return html


def main():
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)
    with open(os.path.join(OUT, "style.css"), "w") as f:
        f.write(CSS)
    md = markdown.Markdown(extensions=["tables", "fenced_code", "toc"])
    navs = [(slug, title) for slug, _, title in PAGES]
    for slug, path, title in PAGES:
        with open(path) as f:
            body = md.reset().convert(f.read())
        body = _fix_links(body)
        nav = "\n".join(
            f'<a href="{s}.html"'
            f'{" class=current" if s == slug else ""}>{t}</a>'
            for s, t in navs)
        page = (f"<!doctype html><html><head><meta charset='utf-8'>"
                f"<title>{title} — sporco-tpu</title>"
                f"<link rel=stylesheet href=style.css></head><body>"
                f"<div class=wrap><nav><h3>sporco-tpu</h3>{nav}</nav>"
                f"<main>{body}</main></div></body></html>")
        with open(os.path.join(OUT, f"{slug}.html"), "w") as f:
            f.write(page)
    print(f"rendered {len(PAGES)} pages into {OUT}")


if __name__ == "__main__":
    main()

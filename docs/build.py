"""Render docs/*.md (+ README) to standalone HTML under docs/_build/.

Dependency-light docs build (the reference uses sphinx+readthedocs;
this repo keeps docs as markdown and renders them in CI — see
.github/workflows/pythonpackage.yml `docs` job). Runs with the stdlib
only if `markdown` is unavailable (pre-formatted fallback).
"""

from __future__ import annotations

import html
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
OUT = os.path.join(HERE, "_build")

PAGES = [
    ("index", os.path.join(ROOT, "README.md"), "muon-tpu"),
    ("api", os.path.join(HERE, "api.md"), "API reference"),
    ("design", os.path.join(HERE, "design.md"), "Design"),
]

TEMPLATE = """<!doctype html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
body {{ font: 15px/1.5 system-ui, sans-serif; max-width: 60em;
       margin: 2em auto; padding: 0 1em; color: #1a1a1a; }}
code, pre {{ background: #f5f5f5; border-radius: 4px; }}
pre {{ padding: .8em; overflow-x: auto; }}
code {{ padding: .1em .3em; }}
table {{ border-collapse: collapse; }}
td, th {{ border: 1px solid #ccc; padding: .3em .6em; text-align: left; }}
nav a {{ margin-right: 1em; }}
</style></head><body>
<nav><a href="index.html">Home</a><a href="api.html">API</a>
<a href="design.html">Design</a></nav>
{body}
</body></html>
"""


def render(text: str) -> str:
    try:
        import markdown

        return markdown.markdown(
            text, extensions=["tables", "fenced_code"]
        )
    except ImportError:
        return f"<pre>{html.escape(text)}</pre>"


def main() -> int:
    os.makedirs(OUT, exist_ok=True)
    for name, src, title in PAGES:
        if not os.path.exists(src):
            print(f"skip {src} (missing)")
            continue
        body = render(open(src, encoding="utf-8").read())
        out = os.path.join(OUT, f"{name}.html")
        open(out, "w", encoding="utf-8").write(
            TEMPLATE.format(title=title, body=body)
        )
        print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Minimal static documentation build (no sphinx/mkdocs in this image).

Renders the markdown doc set to a navigable HTML site under
``docs/_build/`` using the stdlib-adjacent ``markdown`` package — the
fast-tpu counterpart of the reference's sphinx site
(``/root/reference/doc/index.rst``: index / install / configuration /
output).

    python docs/build_docs.py [outdir]
"""

import os
import sys

import markdown

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

# (title, source path relative to repo root, output name)
PAGES = [
    ("Home", "README.md", "index"),
    ("Install", "docs/install.md", "install"),
    ("Configuration", "docs/configuration.md", "configuration"),
    ("Running & output", "docs/output.md", "output"),
    ("Migration from FAST", "docs/migration.md", "migration"),
    ("Architecture", "ARCHITECTURE.md", "architecture"),
    ("Design notes", "docs/design_notes.md", "design_notes"),
    ("Validation", "docs/validation.md", "validation"),
    ("Performance", "BASELINE.md", "performance"),
]

TEMPLATE = """<!doctype html>
<html><head><meta charset="utf-8">
<title>{title} — fast-tpu</title>
<style>
 body {{ font: 15px/1.55 system-ui, sans-serif; margin: 0; color: #1a1a1a; }}
 nav {{ position: fixed; top: 0; left: 0; bottom: 0; width: 15.5em;
       padding: 1.2em; background: #f4f5f7; overflow-y: auto;
       border-right: 1px solid #ddd; }}
 nav a {{ display: block; padding: .25em 0; color: #245; text-decoration: none; }}
 nav a.current {{ font-weight: 700; }}
 main {{ margin-left: 18.5em; padding: 1.5em 2.5em; max-width: 58em; }}
 pre {{ background: #f6f8fa; padding: .8em 1em; overflow-x: auto;
       border-radius: 6px; }}
 code {{ background: #f2f3f5; padding: .1em .25em; border-radius: 3px;
        font-size: .92em; }}
 pre code {{ background: none; padding: 0; }}
 table {{ border-collapse: collapse; }}
 th, td {{ border: 1px solid #ccc; padding: .3em .6em; }}
 h1, h2 {{ border-bottom: 1px solid #eee; padding-bottom: .2em; }}
</style></head>
<body>
<nav><strong>fast-tpu</strong>{nav}</nav>
<main>{body}</main>
</body></html>
"""


def _rewrite_links(html):
    """Point intra-repo .md links at the built pages."""
    mapping = {}
    for _, src, name in PAGES:
        base = os.path.basename(src)
        mapping[base] = f"{name}.html"
        mapping[src] = f"{name}.html"
    for src, dst in mapping.items():
        html = html.replace(f'href="{src}"', f'href="{dst}"')
    return html


def build(outdir=None):
    outdir = outdir or os.path.join(HERE, "_build")
    os.makedirs(outdir, exist_ok=True)
    md = markdown.Markdown(extensions=["tables", "fenced_code"])
    written = []
    for title, src, name in PAGES:
        path = os.path.join(ROOT, src)
        if not os.path.exists(path):
            print(f"skip {src} (missing)")
            continue
        with open(path, encoding="utf-8") as f:
            body = md.reset().convert(f.read())
        nav = "".join(
            f'<a href="{n}.html"{" class=current" if n == name else ""}>'
            f"{t}</a>"
            for t, s, n in PAGES if os.path.exists(os.path.join(ROOT, s)))
        out = os.path.join(outdir, f"{name}.html")
        with open(out, "w", encoding="utf-8") as f:
            f.write(_rewrite_links(
                TEMPLATE.format(title=title, nav=nav, body=body)))
        written.append(out)
        print(f"wrote {out}")
    return written


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else None)
